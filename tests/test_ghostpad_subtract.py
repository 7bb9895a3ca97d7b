"""Ghost pads (gstghostpad.c proxy semantics) + gst_value_subtract."""

import numpy as np

from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.pipeline import Bin, Pipeline, State, link
from gstreamer_tpu.core.value import (Fraction, FractionRange, IntRange,
                                      ValueList, subtract)


def test_ghost_pad_links_through_bin():
    p = Pipeline()
    src = element_factory_make("videotestsrc", num_buffers=2)
    inner = Bin("convbin")
    conv = element_factory_make("videoconvert")
    scale = element_factory_make("videoscale")
    inner.add(conv, scale)
    link(conv, scale)
    inner.add_ghost_pad("sink", conv.sink_pads()[0])
    inner.add_ghost_pad("src", scale.src_pads()[0])
    sink = element_factory_make("appsink", name="s")
    p.add(src, inner, sink)
    src.src_pads()[0].link(inner.get_pad("sink"))
    inner.get_pad("src").link(sink.sink_pads()[0])
    p.set_state(State.PLAYING)
    p.run()
    assert len(sink) == 2
    # the ghost pad reflects the negotiated target caps
    assert inner.get_pad("sink").caps is not None


def test_subtract_int_range():
    r = IntRange(0, 10, 1)
    out = subtract(r, 5)
    assert isinstance(out, ValueList)
    a, b = out.values
    assert (a.low, a.high) == (0, 4) and (b.low, b.high) == (6, 10)
    assert subtract(r, 42) is r
    assert subtract(5, r) is None
    assert subtract(11, r) == 11


def test_subtract_range_range():
    r = IntRange(0, 100, 1)
    out = subtract(r, IntRange(0, 100, 1))
    assert out is None
    out = subtract(r, IntRange(40, 200, 1))
    assert (out.low, out.high) == (0, 39)
    out = subtract(r, IntRange(20, 30, 1))
    a, b = out.values
    assert (a.low, a.high) == (0, 19) and (b.low, b.high) == (31, 100)


def test_subtract_lists():
    lst = ValueList([1, 2, 3, 4])
    out = subtract(lst, ValueList([2, 4]))
    assert list(out.values) == [1, 3]
    assert subtract(lst, IntRange(1, 4, 1)) is None


def test_subtract_fraction_range():
    fr = FractionRange(Fraction(1, 1), Fraction(30, 1))
    assert subtract(fr, Fraction(25, 1)) is fr       # point removal
    assert subtract(Fraction(15, 1), fr) is None
