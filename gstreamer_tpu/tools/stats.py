"""gst-stats equivalent: run a pipeline with tracers and print a report.

Reference: subprojects/gstreamer/tools/gst-stats.c (parses tracer logs
into per-element stats).  Here tracers run in-process (core/tracer.py)
and the report prints directly.

    python -m gstreamer_tpu.tools.stats 'videotestsrc num-buffers=30 ! fakesink'
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    os.environ.setdefault("GTPU_TRACERS", "latency;stats;rusage")
    from ..core.parse import parse_launch
    from ..core.tracer import hooks

    pipe = parse_launch(" ".join(argv))
    pipe.run()
    print(json.dumps(hooks.reports(), indent=2, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
