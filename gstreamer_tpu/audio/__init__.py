"""Audio DSP library.  Integer paths need 64-bit arithmetic — enable
jax x64 the moment the audio stack is imported (before any tracing)."""
import jax as _jax

_jax.config.update("jax_enable_x64", True)
