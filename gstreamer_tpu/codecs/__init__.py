"""Image codecs — PNG and baseline JPEG, self-implemented.

Reference capability: subprojects/gst-plugins-good/ext/libpng
(gstpngenc.c/gstpngdec.c) and ext/jpeg (gstjpegenc.c/gstjpegdec.c) wrap
libpng/libjpeg.  Here both codecs are implemented natively: PNG over
zlib (stdlib DEFLATE, like libpng) with the five scanline filters and
libpng's minimum-sum adaptive filter heuristic; JPEG as a from-scratch
baseline JFIF codec whose DCT/IDCT run as batched 8x8 matmuls on the
TPU (the MXU-native formulation) with host-side Huffman entropy coding.
"""

from .png import png_decode, png_encode
from .jpeg import jpeg_decode, jpeg_encode

__all__ = ["png_encode", "png_decode", "jpeg_encode", "jpeg_decode"]
