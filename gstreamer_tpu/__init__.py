"""gstreamer_tpu — a TPU-native media-preprocessing framework.

Built from scratch on JAX/XLA/Pallas with the capabilities of GStreamer's
DSP core (reference: GStreamer monorepo 1.29.2.1).  Element graphs are
negotiated at trace time (caps = shape/dtype/format constraint sets) and
compile to single fused XLA programs over batched frames in HBM.
"""

__version__ = "0.1.0"

from .core.caps import Caps
from .core.structure import Structure
from .core.value import Fraction, FractionRange, IntRange, ValueList


def parse_launch(description: str):
    """Build a pipeline from a gst-launch description (gst_parse_launch)."""
    from .core.parse import parse_launch as _pl
    return _pl(description)


def element_factory_make(factory: str, name=None, **props):
    """Instantiate a registered element (gst_element_factory_make)."""
    from .core.element import element_factory_make as _efm
    return _efm(factory, name=name, **props)


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax-heavy modules on
    # bare `import gstreamer_tpu`)
    lazy = {
        "Pipeline": ("gstreamer_tpu.core.pipeline", "Pipeline"),
        "Buffer": ("gstreamer_tpu.core.buffer", "Buffer"),
        "VideoInfo": ("gstreamer_tpu.video.info", "VideoInfo"),
        "AudioInfo": ("gstreamer_tpu.audio.info", "AudioInfo"),
        "VideoConverter": ("gstreamer_tpu.video.converter", "VideoConverter"),
        "VideoOverlayComposition": ("gstreamer_tpu.video.overlay",
                                    "VideoOverlayComposition"),
        "VideoOverlayRectangle": ("gstreamer_tpu.video.overlay",
                                  "VideoOverlayRectangle"),
        "Harness": ("gstreamer_tpu.check.harness", "Harness"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gstreamer_tpu' has no attribute {name!r}")


__all__ = [
    "Caps",
    "Structure",
    "Fraction",
    "FractionRange",
    "IntRange",
    "ValueList",
    "parse_launch",
    "element_factory_make",
    "Pipeline",
    "Buffer",
    "VideoInfo",
    "AudioInfo",
    "VideoConverter",
    "VideoOverlayComposition",
    "VideoOverlayRectangle",
    "Harness",
]
