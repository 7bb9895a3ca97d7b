"""ADPCM: scalar-gold parity, encode/decode consistency, elements."""

import numpy as np
import pytest

from gstreamer_tpu.audio import adpcm
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch


def gold_decode_ima(data, channels):
    """Direct transliteration of adpcmdec_decode_ima_block."""
    blocksize = len(data)
    n_samples = ((blocksize - 4 * channels) * 2 // channels + 1) \
        * channels
    samples = [0] * n_samples
    stepindex = [0, 0]
    for ch in range(channels):
        v = data[ch * 4] | (data[ch * 4 + 1] << 8)
        samples[ch] = v - 0x10000 if v >= 0x8000 else v
        stepindex[ch] = min(data[ch * 4 + 2], 88)
        assert data[ch * 4 + 3] == 0
    i = channels
    idx = 4 * channels
    while i < n_samples:
        for ch in range(channels):
            sample = i + ch
            for j in range(8):
                if j % 2 == 0:
                    code = data[idx] & 0x0F
                else:
                    code = (data[idx] >> 4) & 0x0F
                    idx += 1
                step = adpcm.IMA_STEP_SIZE[stepindex[ch]]
                diff = (2 * (code & 0x7) * step + step) // 8
                if code & 8:
                    diff = -diff
                samples[sample] = max(-32768, min(
                    32767, samples[sample - channels] + diff))
                stepindex[ch] = max(0, min(
                    88, stepindex[ch] + adpcm.IMA_INDEX_ADJUST[code]))
                sample += channels
        i += 8 * channels
    return np.array(samples).reshape(-1, channels)


class TestImaCodec:
    @pytest.mark.parametrize("channels", [1, 2])
    def test_decode_matches_gold(self, channels):
        rng = np.random.default_rng(0)
        block = bytearray(rng.integers(0, 256, 256).astype(np.uint8))
        for ch in range(channels):
            block[ch * 4 + 2] = int(block[ch * 4 + 2]) % 89
            block[ch * 4 + 3] = 0
        got = adpcm.decode_ima_block(bytes(block), channels)
        want = gold_decode_ima(bytes(block), channels)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("channels", [1, 2])
    def test_encode_decode_close(self, channels):
        """ADPCM is lossy: the decoder must track the encoder's own
        prediction exactly, so re-decoding reproduces the encoder's
        internal reconstruction."""
        enc = adpcm.ImaEncoder(channels, blocksize=256)
        spb = enc.samples_per_block
        t = np.arange(spb * 3)
        x = (8000 * np.sin(2 * np.pi * t / 100)).astype(np.int16)
        x = np.stack([x] * channels, -1)
        decoded = []
        for k in range(3):
            blk = enc.encode_block(x[k * spb:(k + 1) * spb])
            decoded.append(adpcm.decode_ima_block(blk, channels))
        got = np.concatenate(decoded)
        # quantization noise bounded by the local step size
        err = np.abs(got.astype(np.int64) - x.astype(np.int64))
        assert err.mean() < 100
        assert err.max() < 2000

    def test_ms_decode_known_block(self):
        # hand-built mono MS block: predictor 0, idelta 16,
        # samples 100, 200, then zero nibbles keep predicting
        blk = bytearray(16)
        blk[0] = 0
        blk[1:3] = (16).to_bytes(2, "little")
        blk[3:5] = (200).to_bytes(2, "little")   # sample 1
        blk[5:7] = (100).to_bytes(2, "little")   # sample 0
        got = adpcm.decode_ms_block(bytes(blk), 1)
        assert got[0, 0] == 100 and got[1, 0] == 200
        # coeff set 0: predict = prev * 256 >> 8 = prev
        assert got[2, 0] == 200 and got[3, 0] == 200


class TestAdpcmElements:
    def test_pipeline_roundtrip(self):
        p = parse_launch(
            "audiotestsrc num-buffers=8 samplesperbuffer=1017 "
            "wave=sine freq=300 ! audio/x-raw,format=S16LE,rate=22050,"
            "channels=1 ! adpcmenc ! adpcmdec ! appsink name=out")
        p.run()
        outs = []
        while (s := p.get_by_name("out").pull_sample()) is not None:
            assert s.caps[0].name == "audio/x-raw"
            outs.append(np.asarray(s.buffer.data))
        got = np.concatenate(outs)
        # 8*1017 = 8136 samples; whole blocks of 2041 -> 3 blocks
        assert len(got) >= 2041 * 3
        g = parse_launch(
            "audiotestsrc num-buffers=8 samplesperbuffer=1017 "
            "wave=sine freq=300 ! audio/x-raw,format=S16LE,rate=22050,"
            "channels=1 ! appsink name=out")
        g.run()
        wants = []
        while (s := g.get_by_name("out").pull_sample()) is not None:
            wants.append(np.asarray(s.buffer.data))
        want = np.concatenate(wants)[:len(got)]
        err = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert err.mean() < 200

    def test_coded_caps(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=2041 ! "
            "audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            "adpcmenc ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        caps = s.caps[0]
        assert caps.name == "audio/x-adpcm"
        assert caps["layout"] == "dvi"
        assert caps["block_align"] == 1024
