"""Clean-room Theora decoder: BIT-EXACT parity vs the real
libtheoradec (tests/theora_oracle.py) — the library the reference's
theoradec wraps (gst-plugins-base/ext/theora/gsttheoradec.c:1).

Theora decode is integer-exact, so every comparison here is
array_equal, not SNR."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import theora_oracle as to  # noqa: E402

from gstreamer_tpu.codecs.theora import TheoraDecoder, decode_ogg  # noqa: E402
from gstreamer_tpu.core.parse import parse_launch  # noqa: E402
from gstreamer_tpu.elements.ogg import parse_ogg_pages  # noqa: E402

needs_theora = pytest.mark.skipif(not to.have_theora(),
                                  reason="system libtheora missing")

_REF = "/root/reference/subprojects"


def _exact(hdrs, packets):
    gold = to.decode_packets(hdrs, packets)
    dec = TheoraDecoder(hdrs[0], hdrs[1], hdrs[2])
    for fi, pkt in enumerate(packets):
        out = dec.decode_packet(pkt)
        for i in range(3):
            np.testing.assert_array_equal(
                gold[0][fi][i], out[i],
                err_msg=f"frame {fi} plane {i}")


def _noise(rng, shape, s=30):
    return np.clip(rng.normal(128, s, shape), 0, 255).astype(np.uint8)


@needs_theora
class TestIntraParity:
    @pytest.mark.parametrize("w,h,fmt,q", [
        (64, 48, 0, 63), (64, 48, 0, 5), (48, 48, 2, 40),
        (32, 32, 3, 40), (176, 144, 0, 30), (50, 38, 0, 40),
    ])
    def test_intra_exact(self, w, h, fmt, q):
        rng = np.random.default_rng(9)
        fw, fh = (w + 15) & ~15, (h + 15) & ~15
        if fmt == 0:
            cs = (fh // 2, fw // 2)
        elif fmt == 2:
            cs = (fh, fw // 2)
        else:
            cs = (fh, fw)
        frames = [(_noise(rng, (fh, fw)), _noise(rng, cs, 20),
                   _noise(rng, cs, 20))]
        hdrs, pkts = to.encode_packets(frames, w, h, pixel_fmt=fmt,
                                       quality=q)
        _exact(hdrs, pkts)


@needs_theora
class TestInterParity:
    def test_panning_sequence(self):
        rng = np.random.default_rng(5)
        W, H = 96, 80
        big = _noise(rng, (H + 64, W + 64), 35)
        bigc = _noise(rng, ((H + 64) // 2, (W + 64) // 2), 20)
        frames = []
        for (dx, dy) in [(0, 0), (1, 0), (3, 1), (6, 2), (10, 3),
                         (13, 6), (15, 9), (18, 13)]:
            frames.append((
                np.ascontiguousarray(big[dy:dy + H, dx:dx + W]),
                np.ascontiguousarray(
                    bigc[dy // 2:dy // 2 + H // 2,
                         dx // 2:dx // 2 + W // 2]),
                np.ascontiguousarray(
                    bigc[dy // 2 + 4:dy // 2 + 4 + H // 2,
                         dx // 2 + 8:dx // 2 + 8 + W // 2])))
        hdrs, pkts = to.encode_packets(frames, W, H)
        _exact(hdrs, pkts)

    def test_scene_cut_and_static(self):
        rng = np.random.default_rng(7)
        W, H = 96, 80
        a = _noise(rng, (H, W))
        frames = [(a, _noise(rng, (H // 2, W // 2), 20),
                   _noise(rng, (H // 2, W // 2), 20))] * 3
        frames += [(_noise(rng, (H, W)),
                    _noise(rng, (H // 2, W // 2), 20),
                    _noise(rng, (H // 2, W // 2), 20))
                   for _ in range(2)]
        hdrs, pkts = to.encode_packets(frames, W, H, quality=40)
        _exact(hdrs, pkts)

    def test_local_block_motion(self):
        rng = np.random.default_rng(3)
        W, H = 96, 80
        base = _noise(rng, (H, W))
        frames = []
        for k in range(5):
            y = base.copy()
            for (bx, by, ddx, ddy) in [(8, 8, 2, 1), (40, 16, -2, 1),
                                       (64, 40, 1, -2)]:
                sx, sy = bx + ddx * k, by + ddy * k
                y[sy:sy + 8, sx:sx + 8] = base[by:by + 8, bx:bx + 8]
            frames.append((y, np.full((H // 2, W // 2), 110, np.uint8),
                           np.full((H // 2, W // 2), 130, np.uint8)))
        hdrs, pkts = to.encode_packets(frames, W, H, quality=40)
        _exact(hdrs, pkts)


@needs_theora
class TestReferenceFiles:
    @pytest.mark.parametrize("rel", [
        "gst-plugins-base/tests/files/theora.ogg",
        "gst-plugins-base/tests/files/theora-vorbis.ogg",
        "gst-plugins-good/tests/files/splitvideo00.ogg",
        "gst-plugins-good/tests/files/splitvideo01.ogg",
    ])
    def test_file_exact(self, rel):
        path = os.path.join(_REF, rel)
        if not os.path.exists(path):
            pytest.skip("reference file absent")
        data = open(path, "rb").read()
        streams = {}
        for serial, gran, pkts in parse_ogg_pages(data):
            streams.setdefault(serial, []).extend(pkts)
        th = [p for p in streams.values()
              if p and p[0].startswith(b"\x80theora")]
        assert th, "no theora stream"
        hdrs, packets = th[0][:3], th[0][3:]
        _exact(hdrs, packets)


@needs_theora
class TestElements:
    def test_theoraenc_theoradec_roundtrip(self, tmp_path):
        path = tmp_path / "t.ogv"
        p = parse_launch(
            "videotestsrc num-buffers=6 pattern=ball ! "
            "video/x-raw,format=I420,width=96,height=80,"
            "framerate=30/1 ! "
            f"theoraenc location={path} quality=50")
        p.run()
        p.set_state("null")
        assert path.exists() and path.stat().st_size > 500

        d = parse_launch(f"theoradec location={path} ! appsink name=o")
        d.run()
        sink = d.get_by_name("o")
        total = 0
        caps = None
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            caps = s.caps
            y = np.asarray(s.buffer.data[0])
            total += y.shape[0] if y.ndim == 3 else 1
        assert total == 6
        assert int(caps[0]["width"]) == 96
        assert str(caps[0]["format"]) == "I420"

        # our decode of the written file is bit-exact vs libtheoradec
        data = path.read_bytes()
        streams = {}
        for serial, gran, pkts in parse_ogg_pages(data):
            streams.setdefault(serial, []).extend(pkts)
        th = [p for p in streams.values()
              if p and p[0].startswith(b"\x80theora")][0]
        gold = to.decode_packets(th[:3], th[3:])
        frames, fps, dims = decode_ogg(data)
        assert len(frames) == 6 and dims == (96, 80)
        for i in range(6):
            np.testing.assert_array_equal(gold[0][i][0][:80, :96],
                                          frames[i][0])

    def test_cropped_dims(self):
        """Non-multiple-of-16 picture sizes decode to the cropped
        picture region."""
        rng = np.random.default_rng(1)
        W, H = 50, 38
        fw, fh = 64, 48
        frames = [(_noise(rng, (fh, fw)),
                   _noise(rng, (fh // 2, fw // 2), 20),
                   _noise(rng, (fh // 2, fw // 2), 20))]
        hdrs, pkts = to.encode_packets(frames, W, H, quality=40)
        from gstreamer_tpu.codecs.theora import TheoraDecoder
        dec = TheoraDecoder(hdrs[0], hdrs[1], hdrs[2])
        out = dec.crop(dec.decode_packet(pkts[0]))
        assert out[0].shape == (38, 50)
        assert out[1].shape == (19, 25)


@needs_theora
class TestRobustness:
    def test_bad_headers(self):
        with pytest.raises(ValueError):
            TheoraDecoder(b"\x80cheora" + b"\0" * 40, None, b"")

    def test_garbage_packet_typed_error(self):
        rng = np.random.default_rng(1)
        frames = [(_noise(rng, (48, 64)), _noise(rng, (24, 32), 20),
                   _noise(rng, (24, 32), 20))]
        hdrs, pkts = to.encode_packets(frames, 64, 48)
        dec = TheoraDecoder(hdrs[0], hdrs[1], hdrs[2])
        dec.decode_packet(pkts[0])
        from gstreamer_tpu.codecs.theora import EndOfPacket
        for _ in range(10):
            blob = rng.integers(0, 256, rng.integers(4, 64),
                                dtype=np.uint8).tobytes()
            blob = bytes([blob[0] & 0x3F]) + blob[1:]  # frame marker
            try:
                dec.decode_packet(blob)
            except (ValueError, EndOfPacket, IndexError):
                pass
