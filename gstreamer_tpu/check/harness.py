"""Harness — single-element test rig.

TPU-native re-design of GstHarness (reference:
subprojects/gstreamer/libs/gst/check/gstharness.c — floating src/sink pads
around one element, auto caps/segment, :50 docs; launch-line support
gst_harness_new_parse).

    h = Harness("videoconvert")
    h.set_caps("video/x-raw,format=I420,width=8,height=8",
               "video/x-raw,format=RGB,width=8,height=8")
    out = h.push(planes)        # returns the transformed data
"""

from __future__ import annotations

from typing import Any, List, Optional

import numpy as np

from ..core.buffer import Buffer, Sample
from ..core.caps import Caps
from ..core.element import element_factory_make
from ..core.parse import parse_launch
from ..core.pipeline import Pipeline, link


class Harness:
    def __init__(self, element_or_launch: str, **props):
        self.pipeline = Pipeline()
        if ("!" in element_or_launch or " " in element_or_launch.strip()):
            inner = parse_launch(element_or_launch)
            elems = inner.iterate_elements()
            for e in elems:
                e.parent = None
            self.pipeline.add(*elems)
            self.element = elems[0]
            self._last = elems[-1]
        else:
            self.element = element_factory_make(element_or_launch, **props)
            self.pipeline.add(self.element)
            self._last = self.element
        self.src = element_factory_make("appsrc", name="hsrc")
        self.sink = element_factory_make("appsink", name="hsink")
        self.pipeline.add(self.src, self.sink)
        if self.element.sink_pads():
            link(self.src, self.element)
        if self._last.src_pads():
            link(self._last, self.sink)
        self._compiled = False

    def set_caps(self, src_caps: str, sink_caps: Optional[str] = None):
        self.src.set_property("caps", Caps.from_string(src_caps))
        if sink_caps:
            cf = element_factory_make("capsfilter",
                                      caps=Caps.from_string(sink_caps))
            # splice capsfilter between element and sink
            last_src = self._last.src_pads()[0]
            peer = last_src.peer
            last_src.peer = None
            peer.peer = None
            self.pipeline.add(cf)
            link(self._last, cf)
            link(cf, self.sink)
        return self

    def push(self, data: Any, pts: Optional[int] = None,
             duration: Optional[int] = None, batch: int = 1) -> Optional[Any]:
        """Push one buffer through; returns the output data (or None)."""
        self.src.push_buffer(Buffer(data=data, pts=pts, duration=duration,
                                    batch=batch))
        if not self._compiled:
            self.pipeline.compile()
            self.pipeline.set_state("playing")
            self._compiled = True
        self.pipeline.tick()
        s = self.sink.pull_sample()
        return s.buffer.data if s is not None else None

    def push_buffer(self, buf: Buffer) -> Optional[Buffer]:
        self.src.push_buffer(buf)
        if not self._compiled:
            self.pipeline.compile()
            self.pipeline.set_state("playing")
            self._compiled = True
        self.pipeline.tick()
        s = self.sink.pull_sample()
        return s.buffer if s is not None else None

    def pull(self) -> Optional[Sample]:
        return self.sink.pull_sample()

    @property
    def sinkpad_caps(self) -> Optional[Caps]:
        pads = self.element.sink_pads()
        return pads[0].caps if pads else None

    @property
    def srcpad_caps(self) -> Optional[Caps]:
        pads = self._last.src_pads()
        return pads[0].caps if pads else None
