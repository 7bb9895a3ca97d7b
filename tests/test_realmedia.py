"""RealMedia demuxer tests.

Oracle: genuine .rm containers authored through libavformat's rm
muxer (native shim gtpu_av_write_rm: RV20 video + RealAudio 14.4),
decoded back through the clean-room rmdemux + libav decoders.
"""

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


@pytest.fixture(scope="module")
def rm_file(tmp_path_factory):
    from gstreamer_tpu.native import av as native_av
    lib = native_av.get_lib()
    if lib is None or not hasattr(lib, "gtpu_av_write_rm"):
        pytest.skip("libavformat shim unavailable")
    path = str(tmp_path_factory.mktemp("rm") / "test.rm")
    if lib.gtpu_av_write_rm(path.encode(), 64, 48, 12) != 0:
        pytest.skip("rm muxer/encoders unavailable")
    return path


def test_parse_rm_structure(rm_file):
    from gstreamer_tpu.elements.realmedia import _parse_rm
    streams, packets = _parse_rm(rm_file)
    mimes = sorted(s["mime"] for s in streams.values())
    assert mimes == ["audio/x-pn-realaudio", "video/x-pn-realvideo"]
    vid = [s for s in streams.values() if "video" in s["mime"]][0]
    assert (vid["fourcc"], vid["width"], vid["height"]) == \
        ("RV20", 64, 48)
    aud = [s for s in streams.values() if "audio" in s["mime"]][0]
    assert aud["codec"] == "lpcJ"
    assert (aud["rate"], aud["channels"]) == (8000, 1)
    assert len(packets) > 10


def test_rmdemux_video_decode(rm_file):
    p = parse_launch(f"rmdemux location={rm_file} stream=video ! "
                     "avdec_rv20 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    frames = 0
    means = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = s.buffer.data
        y = np.asarray(d[0] if isinstance(d, (tuple, list)) else d)
        if y.ndim == 2:
            y = y[None]
        frames += y.shape[0]
        means.extend(float(f.mean()) for f in y)
    assert frames == 12
    # the authored pattern brightens per frame (memset 16*i + y)
    assert means[6] > means[0] + 20


def test_rmdemux_audio_decode(rm_file):
    p = parse_launch(f"rmdemux location={rm_file} stream=audio ! "
                     "avdec_real_144 ! appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    tot = 0
    rms = 0.0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        a = np.asarray(s.buffer.data)
        tot += a.shape[0]
        rms = max(rms, float(np.sqrt((a ** 2).mean())))
    assert tot >= 12 * 8000 // 25       # >= 480 ms at 8 kHz
    assert rms > 0.01                   # the 440 Hz tone survived


def test_rademux(rm_file, tmp_path):
    from gstreamer_tpu.elements.realmedia import _parse_rm
    streams, packets = _parse_rm(rm_file)
    aud_n = [n for n, s in streams.items()
             if s["mime"].startswith("audio")][0]
    payloads = b"".join(pl for n, _, _, pl in packets if n == aud_n)
    ra = tmp_path / "test.ra"
    ra.write_bytes(streams[aud_n]["type_specific"] + payloads)
    p = parse_launch(f"rademux location={ra} ! avdec_real_144 ! "
                     "appsink name=out")
    p.run()
    sink = p.get_by_name("out")
    tot = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        tot += np.asarray(s.buffer.data).shape[0]
    assert tot >= 12 * 8000 // 25
