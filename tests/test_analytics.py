"""Analytics meta library tests (relation graph, mtd types, tensors,
IoU helpers) + buffer attachment through a pipeline."""

import numpy as np
import pytest

from gstreamer_tpu import analytics as an


def test_relation_graph():
    m = an.RelationMeta()
    od = m.add_od_mtd("dog", 10, 20, 50, 60, 0.9)
    cls = m.add_one_cls_mtd(0.8, "labrador")
    trk = m.add_tracking_mtd(42, first_seen=1000)
    m.set_relation(an.RelTypes.CONTAIN, od.id, cls.id)
    m.set_relation(an.RelTypes.RELATE_TO, cls.id, trk.id)

    assert m.get_relation(od.id, cls.id) & an.RelTypes.CONTAIN
    assert m.get_relation(cls.id, od.id) == an.RelTypes.NONE
    # path od -> cls -> trk needs span 2
    assert not m.exist(od.id, trk.id, max_span=1)
    assert m.exist(od.id, trk.id, max_span=2)
    # restricting relation types breaks the path
    assert not m.exist(od.id, trk.id, max_span=2,
                       cond_types=an.RelTypes.CONTAIN)
    rel = m.get_direct_related(od.id, mtd_type=an.RelationMeta.MTD_CLS)
    assert len(rel) == 1 and rel[0].data.labels == ["labrador"]
    assert od.data.label == "dog" and od.data.w == 50
    assert len(list(m.iterate(an.RelationMeta.MTD_OD))) == 1
    assert len(m) == 3


def test_tracking_and_cls():
    m = an.RelationMeta()
    t = m.add_tracking_mtd(7, first_seen=100)
    t.data.update_last_seen(500)
    t.data.set_lost()
    assert (t.data.last_seen, t.data.lost) == (500, True)
    c = m.add_cls_mtd([0.1, 0.7, 0.2], ["cat", "dog", "bird"])
    assert c.data.index_by_label("dog") == 1
    assert c.data.index_by_label("fish") == -1
    with pytest.raises(ValueError):
        m.add_cls_mtd([0.5], ["a", "b"])


def test_segmentation_mtd():
    m = an.RelationMeta()
    mask = np.zeros((4, 6), np.uint16)
    mask[1:3, 2:4] = 1
    s = m.add_segmentation_mtd(mask, an.SegmentationType.INSTANCE,
                               region_ids=[0, 17], loc_x=8, loc_y=4)
    assert s.data.region_count == 2
    assert s.data.region_index(17) == 1
    assert s.data.masks_loc_x == 8


def test_tensor_meta():
    t = an.Tensor("logits", np.zeros((1, 10), np.float32))
    assert t.data_type == an.TensorDataType.FLOAT32
    assert t.dims == (1, 10)
    assert t.check(an.TensorDataType.FLOAT32, (1, 10))
    assert not t.check(an.TensorDataType.INT8, (1, 10))
    tm = an.TensorMeta([t, an.Tensor("boxes", np.zeros((5, 4), np.int32))])
    assert tm.get_by_id("boxes").dims == (5, 4)
    assert tm.index_from_id("logits") == 0
    assert tm.index_from_id("nope") == -1


def test_iou():
    assert an.iou_int(0, 0, 10, 10, 0, 0, 10, 10) == 1.0
    assert an.iou_int(0, 0, 10, 10, 20, 20, 5, 5) == 0.0
    # half overlap: inter 50, union 150
    assert abs(an.iou_int(0, 0, 10, 10, 5, 0, 10, 10) - 50 / 150) < 1e-9


def test_batched_iou_matches_scalar():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 50, (6, 4))
    b = rng.integers(0, 50, (4, 4))
    a[:, 2:] += 1
    b[:, 2:] += 1
    got = np.asarray(an.batched_iou(a, b))
    for i in range(6):
        for j in range(4):
            ref = an.iou_int(*a[i], *b[j])
            assert abs(got[i, j] - ref) < 1e-5


def test_meta_rides_buffer_through_pipeline():
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.core.parse import parse_launch
    from gstreamer_tpu.core.pipeline import State

    p = parse_launch(
        "appsrc name=in caps=video/x-raw,format=GRAY8,width=8,height=8,"
        "framerate=30/1 ! identity ! appsink name=s")
    buf = Buffer(data=(np.zeros((1, 8, 8), np.uint8),), pts=0, batch=1)
    m = an.RelationMeta()
    m.add_od_mtd("cat", 1, 2, 3, 4, 0.5)
    m.attach(buf)
    p.get_by_name("in").push_buffer(buf)
    p.set_state(State.PLAYING)
    assert p.tick()
    out = p.get_by_name("s").pull_sample().buffer
    got = an.RelationMeta.from_buffer(out)
    assert got is not None and next(got.iterate()).data.label == "cat"
