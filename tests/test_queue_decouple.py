"""Queue decoupling in host-split pipelines: one-tick double buffer with
EOS drain (gstqueue.c:211 thread-decoupling analog)."""

import numpy as np

from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.core.pipeline import State


def _run(desc, n_frames=6):
    p = parse_launch(desc)
    rng = np.random.default_rng(0)
    for k in range(n_frames):
        p.get_by_name("in").push_buffer(Buffer(
            data=(rng.integers(0, 256, (1, 48, 64), np.uint8),
                  rng.integers(0, 256, (1, 24, 32), np.uint8),
                  rng.integers(0, 256, (1, 24, 32), np.uint8)),
            pts=k * 1000, batch=1))
    p.set_state(State.PLAYING)
    while p.tick():
        pass
    sink = p.get_by_name("s")
    outs = []
    while len(sink):
        outs.append(sink.pull_sample())
    return outs


def test_queue_structural_in_fused_pipeline():
    # no host elements -> queue passthrough, same tick count as buffers
    outs = _run("appsrc name=in caps=video/x-raw,format=I420,width=64,"
                "height=48,framerate=30/1 ! queue ! videoconvert ! "
                "video/x-raw,format=RGB ! appsink name=s")
    assert len(outs) == 6
    assert [o.buffer.pts for o in outs] == [k * 1000 for k in range(6)]


def test_queue_decouples_and_drains_with_host_element():
    # deinterlace is a host element -> the queue becomes a one-tick
    # double buffer; EVERY buffer must still arrive, in order (EOS
    # drains the pending one)
    outs = _run("appsrc name=in caps=video/x-raw,format=I420,width=64,"
                "height=48,framerate=30/1 ! deinterlace method=linear "
                "fields=top ! queue ! videobalance contrast=1.1 ! "
                "appsink name=s")
    assert len(outs) == 6
    pts = [o.buffer.pts for o in outs]
    assert pts == sorted(pts)


def test_two_queues_drain():
    outs = _run("appsrc name=in caps=video/x-raw,format=I420,width=64,"
                "height=48,framerate=30/1 ! deinterlace method=linear "
                "fields=top ! queue ! videobalance contrast=1.2 ! "
                "queue ! appsink name=s")
    assert len(outs) == 6
