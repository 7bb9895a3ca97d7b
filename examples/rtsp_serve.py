"""Serve a test pattern over RTSP and pull it back with rtspsrc."""

import numpy as np

from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtsp_server import RTSPMediaFactory, RTSPServer


def main():
    srv = RTSPServer(service=0)
    srv.mount_points.add_factory("/test", RTSPMediaFactory(
        "( videotestsrc num-buffers=30 pattern=ball ! "
        "video/x-raw,format=RGB,width=160,height=120,framerate=15/1 ! "
        "rtpvrawpay name=pay0 pt=96 )", rate_control=False))
    port = srv.attach()
    print(f"serving rtsp://127.0.0.1:{port}/test")

    client = parse_launch(
        f"rtspsrc location=rtsp://127.0.0.1:{port}/test timeout=0.5 "
        "eos-timeouts=3 ! rtpvrawdepay ! appsink name=out")
    client.run()
    sink = client.get_by_name("out")
    frames = 0
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        frames += np.asarray(s.buffer.data[0]).shape[0]
    print(f"client received {frames} frames over RTP")
    srv.shutdown()


if __name__ == "__main__":
    main()
