"""Analytics meta library + ML elements (gst-libs/gst/analytics,
gst/tensordecoders)."""

import numpy as np
import pytest

from gstreamer_tpu.analytics import (REL_TYPE_CONTAIN,
                                     REL_TYPE_RELATE_TO,
                                     ClassificationMtd,
                                     ObjectDetectionMtd, RelationMeta,
                                     Tensor, TensorMtd, TrackingMtd,
                                     get_relation_meta,
                                     relation_meta_of)
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.analytics_elements import register_model


class TestRelationMeta:
    def test_add_and_iterate(self):
        rm = RelationMeta()
        od = rm.add_od_mtd("cat", 10, 20, 30, 40, 0.9)
        cls = rm.add_cls_mtd([0.7, 0.3], ["cat", "dog"])
        assert len(rm) == 2
        assert rm.iter_mtds(ObjectDetectionMtd) == [od]
        assert cls.top() == ("cat", 0.7)
        assert od.get_location() == (10, 20, 30, 40, 0.9)

    def test_relations(self):
        rm = RelationMeta()
        a = rm.add_od_mtd("person", 0, 0, 50, 100)
        b = rm.add_od_mtd("face", 10, 5, 20, 20)
        rm.set_relation(REL_TYPE_CONTAIN, a, b)
        assert rm.exists(a, b, REL_TYPE_CONTAIN)
        assert not rm.exists(b, a, REL_TYPE_CONTAIN)
        assert rm.related_to(a, REL_TYPE_CONTAIN) == [b]

    def test_iou(self):
        a = ObjectDetectionMtd(x=0, y=0, w=10, h=10)
        b = ObjectDetectionMtd(x=5, y=0, w=10, h=10)
        assert a.iou(b) == pytest.approx(50 / 150)
        assert a.iou(a) == 1.0
        c = ObjectDetectionMtd(x=100, y=100, w=5, h=5)
        assert a.iou(c) == 0.0

    def test_buffer_attachment(self):
        buf = Buffer(data=np.zeros(4), pts=0)
        assert get_relation_meta(buf, 0) is None
        rm = get_relation_meta(buf, 0, create=True)
        rm.add_od_mtd("x", 1, 2, 3, 4)
        assert len(relation_meta_of(buf)[0]) == 1


def _yolo_tensor():
    # (4+2 classes, 3 candidates): two overlapping class-0, one class-1
    t = np.zeros((6, 3), np.float32)
    t[:, 0] = [32, 24, 20, 16, 0.9, 0.1]
    t[:, 1] = [33, 24, 20, 16, 0.85, 0.1]
    t[:, 2] = [10, 10, 8, 8, 0.1, 0.7]
    return t


class TestPipelineChain:
    def setup_method(self):
        register_model("toy-yolo", lambda frames: _yolo_tensor())

    def test_full_chain(self):
        p = parse_launch(
            "videotestsrc num-buffers=4 ! video/x-raw,format=GRAY8,"
            "width=64,height=48 ! jaxinference model=toy-yolo ! "
            "yolov8tensordec class-confidence-threshold=0.5 "
            "iou-threshold=0.5 ! ioutracker ! "
            "objectdetectionoverlay ! appsink name=out")
        p.run()
        frames = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            for k, rm in relation_meta_of(s.buffer).items():
                ods = rm.iter_mtds(ObjectDetectionMtd)
                trks = rm.iter_mtds(TrackingMtd)
                assert len(ods) == 2             # NMS removed the dup
                assert {t.track_id for t in trks} == {1, 2}
                # tracks relate to their detections
                for t in trks:
                    rel = rm.related_to(t, REL_TYPE_RELATE_TO,
                                        ObjectDetectionMtd)
                    assert len(rel) == 1
                frames += 1
            y = np.asarray(s.buffer.data
                           if not isinstance(s.buffer.data,
                                             (list, tuple))
                           else s.buffer.data[0])
            assert (y == 255).sum() > 0          # overlay drew boxes
        assert frames == 4

    def test_classifier_decoder(self):
        register_model("toy-cls",
                       lambda frames: np.array([0.1, 3.0, 0.5]))
        p = parse_launch(
            "videotestsrc num-buffers=1 ! video/x-raw,format=GRAY8,"
            "width=16,height=16 ! jaxinference model=toy-cls ! "
            "classifiertensordecoder top-k=2 ! appsink name=out")
        p.run()
        s = p.get_by_name("out").pull_sample()
        rm = relation_meta_of(s.buffer)[0]
        cls = rm.iter_mtds(ClassificationMtd)[0]
        label, conf = cls.top()
        assert label == "1" and conf > 0.8       # argmax of softmax

    def test_tracker_handles_motion_and_loss(self):
        from gstreamer_tpu.core.element import element_factory_make
        trk = element_factory_make("ioutracker", **{
            "iou-score-threshold": 0.3,
            "min-frame-count-for-lost-track": 2})
        trk.start()

        def frame(x):
            buf = Buffer(data=np.zeros(4), pts=0, batch=1)
            rm = get_relation_meta(buf, 0, create=True)
            rm.add_od_mtd("obj", x, 0, 20, 20, 0.9)
            return buf

        b1 = trk.host_process(frame(0))
        b2 = trk.host_process(frame(4))          # moved, still matches
        id1 = relation_meta_of(b1)[0].iter_mtds(TrackingMtd)[0].track_id
        id2 = relation_meta_of(b2)[0].iter_mtds(TrackingMtd)[0].track_id
        assert id1 == id2
        b3 = trk.host_process(frame(100))        # jumped: new track
        id3 = relation_meta_of(b3)[0].iter_mtds(TrackingMtd)[0].track_id
        assert id3 != id1

    def test_ssd_decoder(self):
        buf = Buffer(data=np.zeros(4), pts=0, batch=1)
        rm = get_relation_meta(buf, 0, create=True)
        rm.add_tensor_mtd(Tensor(
            id="boxes", data=np.array([[0.1, 0.2, 0.5, 0.6]])))
        rm.add_tensor_mtd(Tensor(id="scores", data=np.array([[0.9]])))
        from gstreamer_tpu.core.element import element_factory_make
        dec = element_factory_make("ssdobjectdetector")
        out = dec.host_process(buf)
        od = relation_meta_of(out)[0].iter_mtds(ObjectDetectionMtd)[0]
        assert od.x == pytest.approx(0.2)
        assert od.w == pytest.approx(0.4)
        assert od.confidence == pytest.approx(0.9)
