"""Persistent XLA compilation cache — the binary-registry analog.

The reference avoids re-scanning plugins on every launch by writing a
binary registry cache (gstregistrybinary.c:423 write, :574 read) keyed
on the plugin set, read back at init_post (gst.c:656).  The TPU-native
equivalent of "expensive per-process startup work" is XLA/Mosaic
compilation of the fused pipeline programs, so the analog is JAX's
persistent compilation cache: compiled executables are serialized to a
per-user cache directory and later processes deserialize instead of
recompiling.

Environment (mirrors the reference's registry env tier, gst.c:581):

* ``GTPU_CACHE_DIR``      — cache directory (default
  ``$XDG_CACHE_HOME/gstreamer_tpu/xla`` or ``~/.cache/gstreamer_tpu/xla``)
* ``GTPU_CACHE_DISABLE``  — set to 1 to disable (GST_REGISTRY_DISABLE
  analog)
"""

from __future__ import annotations

import os

_enabled = None


def default_cache_dir() -> str:
    env = os.environ.get("GTPU_CACHE_DIR")
    if env:
        return env
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "gstreamer_tpu", "xla")


def ensure_persistent_cache() -> bool:
    """Idempotently enable JAX's persistent compilation cache.

    Returns True when the cache is active.  Called lazily from the
    pipeline compile path so bare imports stay jax-free."""
    global _enabled
    if _enabled is not None:
        return _enabled
    if os.environ.get("GTPU_CACHE_DISABLE", "") not in ("", "0"):
        _enabled = False
        return False
    try:
        import jax

        # CPU compiles are fast and reloading AOT CPU executables
        # spams feature-mismatch warnings; the cold-start pain the
        # cache solves is the TPU Mosaic/XLA compile.  Opt in on CPU
        # with GTPU_CACHE_FORCE=1.
        if (jax.default_backend() == "cpu"
                and os.environ.get("GTPU_CACHE_FORCE", "") in ("", "0")):
            _enabled = False
            return False
        path = default_cache_dir()
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, however small/fast to compile: pipeline
        # programs are many and the point is cold-start latency
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except Exception:
        _enabled = False
    return _enabled
