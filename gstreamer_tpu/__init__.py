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

__all__ = [
    "Caps",
    "Structure",
    "Fraction",
    "FractionRange",
    "IntRange",
    "ValueList",
]
