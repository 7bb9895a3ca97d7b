"""WAV law/ADPCM format-tag interop: wavenc writes tags 6/7/0x11 with
fact chunks, wavparse reads them back (riff-media.c tag mapping)."""

import struct

import numpy as np

from gstreamer_tpu.core.parse import parse_launch


def _fmt_tag(path):
    blob = open(path, "rb").read()
    i = blob.find(b"fmt ")
    return struct.unpack("<H", blob[i + 8:i + 10])[0], blob


class TestLawWav:
    def test_mulaw_roundtrip(self, tmp_path):
        path = tmp_path / "u.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=500 wave=sine"
            f" ! audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"mulawenc ! wavenc location={path}")
        p.run()
        p.set_state("null")
        tag, blob = _fmt_tag(path)
        assert tag == 7
        assert b"fact" in blob
        i = blob.find(b"fact")
        assert struct.unpack("<I", blob[i + 8:i + 12])[0] == 2000

        d = parse_launch(f"wavparse location={path} ! mulawdec ! "
                         f"appsink name=out")
        d.run()
        tot = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            arr = np.asarray(s.buffer.data)
            assert arr.dtype == np.int16
            tot += arr.shape[0]
        assert tot == 2000

    def test_alaw_bit_exact(self, tmp_path):
        path = tmp_path / "a.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=300 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=2 ! "
            f"alawenc ! wavenc location={path}")
        p.run()
        p.set_state("null")
        tag, _ = _fmt_tag(path)
        assert tag == 6

        gold = parse_launch(
            "audiotestsrc num-buffers=2 samplesperbuffer=300 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=2 ! "
            "alawenc ! appsink name=out")
        gold.run()
        want = []
        while (s := gold.get_by_name("out").pull_sample()) is not None:
            want.append(np.asarray(s.buffer.data).reshape(-1, 2))
        want = np.concatenate(want)

        d = parse_launch(f"wavparse location={path} ! appsink name=out")
        d.run()
        s = d.get_by_name("out")
        got = []
        caps = None
        while (smp := s.pull_sample()) is not None:
            caps = smp.caps
            got.append(np.asarray(smp.buffer.data).reshape(-1, 2))
        got = np.concatenate(got)
        assert caps[0].name == "audio/x-alaw"
        assert caps[0]["rate"] == 8000 and caps[0]["channels"] == 2
        np.testing.assert_array_equal(got, want)


class TestAdpcmWav:
    def test_ima_roundtrip(self, tmp_path):
        path = tmp_path / "i.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=8 samplesperbuffer=505 ! "
            f"audio/x-raw,format=S16LE,rate=16000,channels=1 ! "
            f"adpcmenc blockalign=1024 ! wavenc location={path}")
        p.run()
        p.set_state("null")
        tag, blob = _fmt_tag(path)
        assert tag == 0x11
        i = blob.find(b"fmt ")
        ba = struct.unpack("<H", blob[i + 20:i + 22])[0]
        assert ba == 1024

        d = parse_launch(f"wavparse location={path} ! adpcmdec ! "
                         f"appsink name=out")
        d.run()
        tot = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            tot += np.asarray(s.buffer.data).shape[0]
        # spb = (1024-4)*2+1 = 2041 per full block
        assert tot >= 8 * 505 - 2041 and tot % 2041 == 0

    def test_adpcm_caps_from_wav(self, tmp_path):
        path = tmp_path / "c.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=4 samplesperbuffer=1000 ! "
            f"audio/x-raw,format=S16LE,rate=22050,channels=2 ! "
            f"adpcmenc ! wavenc location={path}")
        p.run()
        p.set_state("null")
        d = parse_launch(f"wavparse location={path} ! appsink name=out")
        d.run()
        s = d.get_by_name("out").pull_sample()
        st = s.caps[0]
        assert st.name == "audio/x-adpcm"
        assert st["layout"] == "dvi"
        assert st["rate"] == 22050 and st["channels"] == 2
        assert st["block_align"] > 0


class TestPcmStillWorks:
    def test_pcm_fmt18_roundtrip(self, tmp_path):
        path = tmp_path / "p.wav"
        p = parse_launch(
            f"audiotestsrc num-buffers=3 samplesperbuffer=441 wave=saw"
            f" ! audio/x-raw,format=S16LE,rate=44100,channels=2 ! "
            f"wavenc location={path}")
        p.run()
        p.set_state("null")
        tag, _ = _fmt_tag(path)
        assert tag == 1
        d = parse_launch(f"wavparse location={path} ! appsink name=out")
        d.run()
        tot = 0
        while (s := d.get_by_name("out").pull_sample()) is not None:
            tot += np.asarray(s.buffer.data).shape[0]
        assert tot == 3 * 441
