"""Codec implementations.

Clean-room codecs in this package (each with bit/near-parity tests
against the corresponding system-library oracle): PNG, baseline JPEG,
Vorbis, MP3, AAC-LC + HE-AAC v1 (SBR), Theora, and the Opus CELT path
(celt.py — bit-parity with libopus float decode, mono and stereo).
System-library wrappers (the reference's own architecture for these):
Opus SILK/hybrid (opus.py), Theora/Vorbis encoders, libav family.

Reference capability for the image codecs:
subprojects/gst-plugins-good/ext/libpng (gstpngenc.c/gstpngdec.c) and
ext/jpeg (gstjpegenc.c/gstjpegdec.c) wrap libpng/libjpeg.  Here both
are implemented natively: PNG over zlib (stdlib DEFLATE, like libpng)
with the five scanline filters and libpng's minimum-sum adaptive
filter heuristic; JPEG as a from-scratch baseline JFIF codec whose
DCT/IDCT run as batched 8x8 matmuls on the TPU (the MXU-native
formulation) with host-side Huffman entropy coding.
"""

from .png import png_decode, png_encode
from .jpeg import jpeg_decode, jpeg_encode

__all__ = ["png_encode", "png_decode", "jpeg_encode", "jpeg_decode"]
