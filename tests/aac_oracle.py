"""AAC gold oracle: the system libavcodec native aac encoder/decoder.

This is the same oracle architecture the reference uses for AAC
(gst-libav wraps libavcodec; gst-plugins-bad ext/faad wraps faad2):
the REAL system decoder provides the parity gold for the clean-room
decoder in gstreamer_tpu/codecs/aac.py.

A tiny C shim is compiled on demand against the installed libavcodec
dev headers (struct layouts are version-specific, so ctypes is too
fragile); results stream over pipes as raw binary.
"""

from __future__ import annotations

import os
import struct
import subprocess
import tempfile
from typing import List, Optional, Tuple

import numpy as np

_BIN = os.path.join(tempfile.gettempdir(), "gtpu_aac_oracle")
_SRC = r"""
#include <libavcodec/avcodec.h>
#include <libavutil/opt.h>
#include <libavutil/channel_layout.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(1); }

static int dec_main(const char *inp, const char *outp) {
    FILE *fi = fopen(inp, "rb");
    if (!fi) die("open in");
    fseek(fi, 0, SEEK_END); long n = ftell(fi); fseek(fi, 0, SEEK_SET);
    uint8_t *buf = malloc(n + AV_INPUT_BUFFER_PADDING_SIZE);
    if (fread(buf, 1, n, fi) != (size_t)n) die("read");
    memset(buf + n, 0, AV_INPUT_BUFFER_PADDING_SIZE);
    fclose(fi);

    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_AAC);
    AVCodecContext *c = avcodec_alloc_context3(codec);
    if (avcodec_open2(c, codec, NULL) < 0) die("open dec");
    AVCodecParserContext *pars = av_parser_init(AV_CODEC_ID_AAC);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    FILE *fo = fopen(outp, "wb");
    int rate = 0, ch = 0;
    long pos = 0;
    int hdr_done = 0;
    while (pos < n) {
        uint8_t *od; int os;
        int used = av_parser_parse2(pars, c, &od, &os,
                                    buf + pos, n - pos,
                                    AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
        if (used < 0) die("parse");
        pos += used;
        if (!os) continue;
        pkt->data = od; pkt->size = os;
        if (avcodec_send_packet(c, pkt) < 0) die("send");
        while (avcodec_receive_frame(c, fr) == 0) {
            rate = fr->sample_rate;
            ch = c->ch_layout.nb_channels;
            if (!hdr_done) {
                fwrite(&rate, 4, 1, fo); fwrite(&ch, 4, 1, fo);
                hdr_done = 1;
            }
            for (int i = 0; i < fr->nb_samples; i++)
                for (int k = 0; k < ch; k++)
                    fwrite(((float *)fr->data[k]) + i, 4, 1, fo);
        }
    }
    avcodec_send_packet(c, NULL);
    while (avcodec_receive_frame(c, fr) == 0) {
        for (int i = 0; i < fr->nb_samples; i++)
            for (int k = 0; k < ch; k++)
                fwrite(((float *)fr->data[k]) + i, 4, 1, fo);
    }
    fclose(fo);
    return 0;
}

static int enc_main(const char *inp, int rate, int ch, int bitrate,
                    const char *outp, const char *opts,
                    const char *layout) {
    FILE *fi = fopen(inp, "rb");
    if (!fi) die("open in");
    fseek(fi, 0, SEEK_END); long n = ftell(fi); fseek(fi, 0, SEEK_SET);
    int16_t *pcm = malloc(n);
    if (fread(pcm, 1, n, fi) != (size_t)n) die("read");
    fclose(fi);
    long nsamp = n / 2 / ch;

    const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    AVCodecContext *c = avcodec_alloc_context3(codec);
    c->sample_rate = rate;
    c->sample_fmt = AV_SAMPLE_FMT_FLTP;
    c->bit_rate = bitrate;
    c->profile = FF_PROFILE_AAC_LOW;
    if (layout && layout[0]) {
        if (av_channel_layout_from_string(&c->ch_layout, layout) < 0)
            die("bad layout");
        if (c->ch_layout.nb_channels != ch) die("layout/ch mismatch");
    } else {
        av_channel_layout_default(&c->ch_layout, ch);
    }
    if (opts && opts[0])
        if (av_set_options_string(c->priv_data, opts, "=", ":") < 0)
            die("bad opts");
    if (avcodec_open2(c, codec, NULL) < 0) die("open enc");
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    fr->format = AV_SAMPLE_FMT_FLTP;
    fr->nb_samples = c->frame_size;
    av_channel_layout_copy(&fr->ch_layout, &c->ch_layout);
    if (av_frame_get_buffer(fr, 0) < 0) die("frame buf");
    FILE *fo = fopen(outp, "wb");
    for (long lo = 0; lo < nsamp; lo += c->frame_size) {
        int m = nsamp - lo < c->frame_size ? nsamp - lo : c->frame_size;
        av_frame_make_writable(fr);
        for (int k = 0; k < ch; k++) {
            float *d = (float *)fr->data[k];
            for (int i = 0; i < c->frame_size; i++)
                d[i] = i < m ? pcm[(lo + i) * ch + k] / 32768.0f : 0.0f;
        }
        if (avcodec_send_packet == NULL) die("impossible");
        if (avcodec_send_frame(c, fr) < 0) die("send frame");
        while (avcodec_receive_packet(c, pkt) == 0) {
            uint32_t sz = pkt->size;
            fwrite(&sz, 4, 1, fo);
            fwrite(pkt->data, 1, pkt->size, fo);
            av_packet_unref(pkt);
        }
    }
    avcodec_send_frame(c, NULL);
    while (avcodec_receive_packet(c, pkt) == 0) {
        uint32_t sz = pkt->size;
        fwrite(&sz, 4, 1, fo);
        fwrite(pkt->data, 1, pkt->size, fo);
        av_packet_unref(pkt);
    }
    fclose(fo);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 4 && !strcmp(argv[1], "dec"))
        return dec_main(argv[2], argv[3]);
    if (argc >= 7 && !strcmp(argv[1], "enc"))
        return enc_main(argv[2], atoi(argv[3]), atoi(argv[4]),
                        atoi(argv[5]), argv[6],
                        argc > 7 ? argv[7] : "",
                        argc > 8 ? argv[8] : "");
    die("usage: dec in out | enc in rate ch bitrate out");
    return 1;
}
"""

_built: Optional[bool] = None

# sampling_frequency_index table, ISO/IEC 14496-3 §1.6.3.4
ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350]


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


def have_aac() -> bool:
    return _build()


def adts_header(frame_len: int, rate: int, ch: int,
                profile: int = 1) -> bytes:
    """7-byte ADTS header (no CRC), ISO/IEC 14496-3 §1.A.2.2."""
    sfi = ADTS_RATES.index(rate)
    total = frame_len + 7
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF1                         # MPEG-4, layer 0, no CRC
    b[2] = (profile << 6) | (sfi << 2) | ((ch >> 2) & 1)
    b[3] = ((ch & 3) << 6) | ((total >> 11) & 0x3)
    b[4] = (total >> 3) & 0xFF
    b[5] = ((total & 7) << 5) | 0x1F    # buffer fullness 0x7FF
    b[6] = 0xFC
    return bytes(b)


def aac_encode_adts(pcm16: np.ndarray, rate: int,
                    bitrate: int = 128000,
                    opts: str = "",
                    layout: str = "") -> Optional[bytes]:
    """int16 (n, ch) -> ADTS stream encoded by libavcodec's native
    AAC-LC encoder.  opts: encoder private options, e.g.
    "aac_pns=0:aac_is=0" (PNS uses a decoder-chosen RNG per spec, so
    exact parity requires disabling it at the encoder)."""
    if not _build():
        return None
    pcm16 = np.atleast_2d(np.asarray(pcm16, np.int16))
    if pcm16.shape[0] < pcm16.shape[1]:
        pcm16 = pcm16.T
    n, ch = pcm16.shape
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.raw")
        outp = os.path.join(d, "out.bin")
        pcm16.astype("<i2").tofile(inp)
        r = subprocess.run([_BIN, "enc", inp, str(rate), str(ch),
                            str(bitrate), outp, opts, layout],
                           capture_output=True, timeout=300)
        if r.returncode != 0:
            return None
        with open(outp, "rb") as f:
            blob = f.read()
    cc = 7 if ch == 8 else ch           # channel_config 7 means 7.1
    out = bytearray()
    pos = 0
    while pos + 4 <= len(blob):
        (sz,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        frame = blob[pos:pos + sz]
        pos += sz
        out += adts_header(len(frame), rate, cc) + frame
    return bytes(out)


def aac_decode_adts(data: bytes) -> Optional[Tuple[np.ndarray, int, int]]:
    """ADTS stream -> (float32 (n, ch), rate, ch) via libavcodec."""
    if not _build():
        return None
    with tempfile.TemporaryDirectory() as d:
        inp = os.path.join(d, "in.adts")
        outp = os.path.join(d, "out.raw")
        with open(inp, "wb") as f:
            f.write(data)
        r = subprocess.run([_BIN, "dec", inp, outp],
                           capture_output=True, timeout=300)
        if r.returncode != 0 or not os.path.exists(outp):
            return None
        with open(outp, "rb") as f:
            raw = f.read()
    if len(raw) < 8:
        return None
    rate, ch = struct.unpack_from("<ii", raw, 0)
    pcm = np.frombuffer(raw[8:], "<f4").reshape(-1, ch)
    return pcm, rate, ch
