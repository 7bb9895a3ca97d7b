"""Caps features (GstCapsFeatures analog): parse/serialize/intersect
semantics plus negotiated memory:HBM / memory:SystemMemory residency.

Reference: subprojects/gstreamer/gst/gstcapsfeatures.c:1 (features per
caps structure), gst_caps_intersect honoring features gstcaps.c:2205;
the accelerator-residency precedent is memory:GLMemory (SURVEY §2.10).
"""

import numpy as np
import pytest

from gstreamer_tpu import parse_launch
from gstreamer_tpu.core.caps import Caps
from gstreamer_tpu.core.structure import (CapsFeatures,
                                          features_compatible,
                                          parse_structure)


class TestCapsFeaturesCore:
    def test_parse_and_serialize(self):
        s = parse_structure("video/x-raw(memory:HBM), format=I420")
        assert s.features is not None
        assert "memory:HBM" in s.features
        assert repr(s) == "video/x-raw(memory:HBM), format=I420"
        # roundtrip
        s2 = parse_structure(repr(s))
        assert s2.features == s.features and s2.fields == s.fields

    def test_any_features(self):
        s = parse_structure("video/x-raw(ANY), width=4")
        assert s.features.is_any
        assert repr(s) == "video/x-raw(ANY), width=4"

    def test_host_is_sysmem_alias(self):
        f1 = CapsFeatures("memory:Host")
        f2 = CapsFeatures("memory:SystemMemory")
        assert f1 == f2
        assert f1.is_sysmem()
        assert CapsFeatures() == f2          # empty = sysmem default

    def test_intersect_honors_features(self):
        hbm = Caps.from_string("video/x-raw(memory:HBM), width=[1,100]")
        host = Caps.from_string("video/x-raw(memory:Host), width=64")
        plain = Caps.from_string("video/x-raw, width=64")
        anyf = Caps.from_string("video/x-raw(ANY), width=64")
        assert hbm.intersect(host).is_empty
        r = hbm.intersect(plain)              # agnostic matches
        assert not r.is_empty
        assert "memory:HBM" in r[0].features
        r2 = hbm.intersect(anyf)
        assert "memory:HBM" in r2[0].features
        assert not host.intersect(
            Caps.from_string(
                "video/x-raw(memory:SystemMemory), width=64")).is_empty

    def test_subset_and_fixate(self):
        sub = Caps.from_string("video/x-raw(memory:HBM), width=64")
        sup = Caps.from_string("video/x-raw(memory:HBM), width=[1,100]")
        bad = Caps.from_string("video/x-raw(memory:Host), width=[1,100]")
        assert sub.is_subset(sup)
        assert not sub.is_subset(bad)
        fx = sup.fixate()
        assert "memory:HBM" in fx[0].features

    def test_compatibility_matrix(self):
        hbm = CapsFeatures("memory:HBM")
        host = CapsFeatures("memory:Host")
        assert features_compatible(None, hbm)
        assert features_compatible(hbm, CapsFeatures.any())
        assert not features_compatible(hbm, host)


class TestNegotiatedResidency:
    def test_device_links_pick_hbm(self):
        """Fused device-device links negotiate memory:HBM; the host
        staging link out of a pulling source stays SystemMemory."""
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videoconvert ! "
            "video/x-raw,format=RGB,width=32,height=16 ! fakesink")
        p.negotiate()
        feats = {}
        for e in p.iterate_elements():
            for sp in e.src_pads():
                if sp.peer is not None:
                    feats[e.FACTORY] = str(sp.caps[0].features)
        assert feats["videotestsrc"] == "memory:SystemMemory"
        assert feats["videoconvert"] == "memory:HBM"
        assert feats["capsfilter"] == "memory:HBM"

    def test_explicit_host_boundary_splits_fusion(self):
        """A user capsfilter demanding memory:Host between device
        elements forces a D2H round trip (GL upload/download analog)
        and un-fuses the program — and the pipeline still runs
        correctly."""
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=gradient ! videoconvert ! "
            '"video/x-raw(memory:Host),format=RGB,width=32,height=16" ! '
            "videoscale ! video/x-raw,width=16,height=8 ! appsink name=o")
        p.run()
        assert p._fused is False
        assert any(e.FACTORY == "capsfilter"
                   for e in p._forced_host_elems)
        sink = p.get_by_name("o")
        s = sink.pull_sample()
        arr = np.asarray(s.buffer.data)
        assert arr.shape[-2:] == (8, 16) or arr.shape[-3:-1] == (8, 16)

        # identical pipeline WITHOUT the host demand stays fused
        p2 = parse_launch(
            "videotestsrc num-buffers=2 pattern=gradient ! videoconvert ! "
            "video/x-raw,format=RGB,width=32,height=16 ! "
            "videoscale ! video/x-raw,width=16,height=8 ! appsink name=o")
        p2.run()
        assert p2._fused is True
        s2 = p2.get_by_name("o").pull_sample()
        np.testing.assert_array_equal(np.asarray(s.buffer.data),
                                      np.asarray(s2.buffer.data))

    def test_explicit_hbm_stays_fused(self):
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videoconvert ! "
            '"video/x-raw(memory:HBM),format=RGB,width=32,height=16" ! '
            "fakesink")
        p.run()
        assert p._fused is True

    def test_host_elements_get_sysmem(self):
        """Links adjacent to genuinely host-side elements resolve to
        SystemMemory."""
        p = parse_launch(
            "videotestsrc num-buffers=1 ! videoconvert ! "
            "video/x-raw,format=RGB,width=32,height=16 ! "
            "pngenc ! appsink name=o")
        p.negotiate()
        for e in p.iterate_elements():
            if e.FACTORY == "capsfilter":
                f = e.src_pads()[0].caps[0].features
                assert f is not None and f.is_sysmem()
