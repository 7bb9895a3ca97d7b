"""Generic video gold oracle: decode packets with the system
libavcodec and return I420 frames.

Used to cross-verify the libvpx-backed VP8/VP9 path (and any other
video codec) against an INDEPENDENT conformant decoder — both
decoders must produce bit-identical reconstructions for these codecs.
Same compiled-shim approach as aac_oracle.py.
"""

from __future__ import annotations

import os
import struct
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_BIN = os.path.join(tempfile.gettempdir(), "gtpu_video_oracle")
_SRC = r"""
#include <libavcodec/avcodec.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

int main(int argc, char **argv) {
    if (argc < 4) die("usage: codec in.pkts out.raw");
    const AVCodec *codec = avcodec_find_decoder_by_name(argv[1]);
    if (!codec) die("no codec");
    AVCodecContext *c = avcodec_alloc_context3(codec);
    if (avcodec_open2(c, codec, NULL) < 0) die("open");
    FILE *fi = fopen(argv[2], "rb");
    if (!fi) die("open in");
    FILE *fo = fopen(argv[3], "wb");
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    uint8_t *buf = NULL;
    size_t cap = 0;
    uint32_t sz;
    for (;;) {
        int flush = fread(&sz, 4, 1, fi) != 1;
        if (!flush) {
            if (sz + AV_INPUT_BUFFER_PADDING_SIZE > cap) {
                cap = sz + AV_INPUT_BUFFER_PADDING_SIZE;
                buf = realloc(buf, cap);
            }
            if (fread(buf, 1, sz, fi) != sz) die("short read");
            memset(buf + sz, 0, AV_INPUT_BUFFER_PADDING_SIZE);
            pkt->data = buf; pkt->size = sz;
            if (avcodec_send_packet(c, pkt) < 0) die("send");
        } else {
            avcodec_send_packet(c, NULL);
        }
        while (avcodec_receive_frame(c, fr) == 0) {
            if (fr->format != AV_PIX_FMT_YUV420P)
                die("not yuv420p");
            uint32_t w = fr->width, h = fr->height;
            fwrite(&w, 4, 1, fo); fwrite(&h, 4, 1, fo);
            for (int pl = 0; pl < 3; pl++) {
                int pw = pl ? (w + 1) / 2 : w;
                int ph = pl ? (h + 1) / 2 : h;
                for (int r = 0; r < ph; r++)
                    fwrite(fr->data[pl] + r * fr->linesize[pl],
                           1, pw, fo);
            }
        }
        if (flush) break;
    }
    fclose(fo);
    return 0;
}
"""

_built: Optional[bool] = None


def _build() -> bool:
    global _built
    if _built is not None:
        return _built
    try:
        src = _BIN + ".c"
        with open(src, "w") as f:
            f.write(_SRC)
        r = subprocess.run(
            ["cc", src, "-o", _BIN, "-lavcodec", "-lavutil", "-O2"],
            capture_output=True, timeout=120)
        _built = r.returncode == 0 and os.path.exists(_BIN)
    except (OSError, subprocess.SubprocessError):
        _built = False
    return _built


def have_decoder(name: str) -> bool:
    return _build()


def decode_packets(codec: str, packets: List[bytes]
                   ) -> Optional[List[Tuple[np.ndarray, np.ndarray,
                                            np.ndarray]]]:
    """codec: libavcodec decoder name ('vp8', 'vp9', 'h264', ...)
    -> list of (Y, U, V) uint8 planes, or None if unavailable."""
    if not _build():
        return None
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.pkts")
        outp = os.path.join(d, "out.raw")
        with open(inp, "wb") as f:
            for p in packets:
                f.write(struct.pack("<I", len(p)) + p)
        r = subprocess.run([_BIN, codec, inp, outp],
                           capture_output=True, timeout=600)
        if r.returncode != 0 or not os.path.exists(outp):
            return None
        with open(outp, "rb") as f:
            raw = f.read()
    frames = []
    pos = 0
    while pos + 8 <= len(raw):
        w, h = struct.unpack_from("<II", raw, pos)
        pos += 8
        planes = []
        for pl in range(3):
            pw = w if pl == 0 else (w + 1) // 2
            ph = h if pl == 0 else (h + 1) // 2
            planes.append(np.frombuffer(
                raw, np.uint8, pw * ph, pos).reshape(ph, pw))
            pos += pw * ph
        frames.append(tuple(planes))
    return frames
