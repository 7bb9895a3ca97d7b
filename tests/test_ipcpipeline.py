"""ipcpipeline master/slave split (reference
gst-plugins-bad/sys/ipcpipeline/): GDP-framed caps+buffers+EOS over
an fd, slave continues the pipeline — including a REAL two-process
split."""

import os
import subprocess
import sys

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


class TestSameProcessSplit:
    def test_video_crosses_fd(self):
        r, w = os.pipe()
        master = parse_launch(
            f"videotestsrc num-buffers=3 ! "
            f"video/x-raw,format=I420,width=64,height=48 ! "
            f"ipcpipelinesink fdout={w}")
        master.run()
        slave = parse_launch(
            f"ipcpipelinesrc fdin={r} ! appsink name=o")
        slave.run()
        frames = 0
        while (s := slave.get_by_name("o").pull_sample()) is not None:
            y = np.asarray(s.buffer.data[0])
            assert y.shape[-2:] == (48, 64)
            frames += getattr(s.buffer, "batch", 1)
        assert frames == 3
        os.close(r)

    def test_audio_crosses_fd(self):
        r, w = os.pipe()
        master = parse_launch(
            f"audiotestsrc num-buffers=2 samplesperbuffer=256 ! "
            f"audio/x-raw,format=S16LE,rate=8000,channels=1 ! "
            f"ipcpipelinesink fdout={w}")
        master.run()
        slave = parse_launch(
            f"ipcslavepipeline fdin={r} ! appsink name=o")
        slave.run()
        total = 0
        while (s := slave.get_by_name("o").pull_sample()) is not None:
            total += np.asarray(s.buffer.data).size
        assert total == 512
        os.close(r)


class TestTwoProcessSplit:
    def test_master_subprocess(self):
        r, w = os.pipe()
        os.set_inheritable(w, True)
        code = (
            "import os\n"
            "from gstreamer_tpu.core.parse import parse_launch\n"
            f"p = parse_launch('videotestsrc num-buffers=2 ! "
            f"video/x-raw,format=I420,width=32,height=32 ! "
            f"ipcpipelinesink fdout={w}')\n"
            "p.run()\n"
            f"os.close({w})\n")
        env = dict(os.environ,
                   PYTHONPATH="/root/repo:" +
                   os.environ.get("PYTHONPATH", ""),
                   JAX_PLATFORMS="cpu")
        proc = subprocess.Popen([sys.executable, "-c", code],
                                pass_fds=(w,), env=env)
        os.close(w)
        slave = parse_launch(
            f"ipcpipelinesrc fdin={r} ! appsink name=o")
        slave.run()
        frames = 0
        while (s := slave.get_by_name("o").pull_sample()) is not None:
            frames += getattr(s.buffer, "batch", 1)
        proc.wait(timeout=60)
        assert proc.returncode == 0
        assert frames == 2
        os.close(r)
