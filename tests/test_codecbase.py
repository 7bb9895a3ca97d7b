"""Video codec base-class scaffolds (gstvideodecoder.c /
gstvideoencoder.c equivalents): frame bookkeeping through a toy RLE
codec subclass, and the real JPEG/PNG codecs as capability proof."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.video.codecbase import (CodecFrame, VideoDecoderBase,
                                           VideoEncoderBase)


def rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and j - i < 255 and data[j] == data[i]:
            j += 1
        out += bytes([j - i, data[i]])
        i = j
    return bytes(out)


def rle_decode(data: bytes) -> bytes:
    out = bytearray()
    for k in range(0, len(data), 2):
        out += bytes([data[k + 1]]) * data[k]
    return bytes(out)


class ToyEncoder(VideoEncoderBase):
    FACTORY = "toyrleenc"

    def handle_frame(self, frame: CodecFrame):
        frame.output_data = rle_encode(bytes(frame.input_data))
        self.finish_frame(frame)
        return frame


class ToyDecoder(VideoDecoderBase):
    FACTORY = "toyrledec"

    def handle_frame(self, frame: CodecFrame):
        frame.output_data = rle_decode(bytes(frame.input_data))
        self.finish_frame(frame)
        return frame


class TestCodecScaffold:
    def test_frame_numbering_and_pts(self):
        enc = ToyEncoder()
        enc.start()
        payloads = [b"aaaabbb", b"cc", b"dddddddd"]
        buf = Buffer(data=list(payloads), pts=1000, duration=100,
                     batch=3)
        out = enc.host_process(buf)
        assert out.batch == 3
        assert enc._frame_number == 3
        assert out.pts == 1000
        for orig, packed in zip(payloads, out.data):
            assert rle_decode(packed) == orig

    def test_roundtrip_through_both_bases(self):
        enc, dec = ToyEncoder(), ToyDecoder()
        enc.start()
        dec.start()
        raw = bytes(np.random.default_rng(0).integers(
            0, 4, 500).astype(np.uint8))
        packets = enc.host_process(
            Buffer(data=[raw], pts=0, duration=10, batch=1))
        frames = dec.host_process(packets)
        assert bytes(frames.data[0]) == raw

    def test_drain_returns_pending(self):
        class Holding(VideoDecoderBase):
            FACTORY = "toyhold"

            def handle_frame(self, frame):
                self._pending.append(frame)    # lookahead: hold frames
                return None

        dec = Holding()
        dec.start()
        out = dec.host_process(Buffer(data=[b"x", b"y"], pts=0,
                                      duration=1, batch=2))
        assert out is None
        drained = dec.drain()
        assert [f.system_frame_number for f in drained] == [0, 1]
        assert dec.drain() == []
