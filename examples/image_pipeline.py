"""JPEG/PNG codec elements: frames -> files -> frames."""

import os
import tempfile

import numpy as np

from gstreamer_tpu.core.parse import parse_launch


def main():
    with tempfile.TemporaryDirectory() as d:
        pat = os.path.join(d, "frame%03d.jpg")
        enc = parse_launch(
            "videotestsrc num-buffers=5 pattern=smpte75 ! "
            "video/x-raw,format=I420,width=160,height=120,framerate=5/1 "
            f"! jpegenc quality=92 ! multifilesink location={pat}")
        enc.run()
        n = len(os.listdir(d))
        dec = parse_launch(
            f"multifilesrc location={pat} ! jpegdec ! videoconvert ! "
            "video/x-raw,format=RGB ! appsink name=out")
        dec.run()
        sink = dec.get_by_name("out")
        frames = 0
        while True:
            s = sink.pull_sample()
            if s is None:
                break
            frames += np.asarray(s.buffer.data[0]).shape[0]
        print(f"encoded {n} JPEGs, decoded {frames} frames back "
              "(DCT/IDCT ran as device matmuls)")


if __name__ == "__main__":
    main()
