"""Tensor-decoder batch 2: yolo26 (NMS-free), YOLOv8-seg, YOLOv8-OBB,
UltraLight face detector, segmentationoverlay."""

import math

import numpy as np

from gstreamer_tpu.analytics import (ObjectDetectionMtd, SegmentationMtd,
                                     Tensor, get_relation_meta,
                                     relation_meta_of)
from gstreamer_tpu.core.buffer import Buffer
from gstreamer_tpu.core.element import element_factory_make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.analytics_elements import register_model
from gstreamer_tpu.elements.tensor_decoders2 import (_poly_area,
                                                     _rotated_iou)


def _buf_with_tensors(frame, **tensors):
    buf = Buffer(data=frame, pts=0)
    rm = get_relation_meta(buf, 0, create=True)
    for tid, arr in tensors.items():
        rm.add_tensor_mtd(Tensor(id=tid.replace("_", "-"),
                                 data=np.asarray(arr, np.float32)))
    return buf


class TestYolo26:
    def test_threshold_no_nms(self):
        # three rows x1,y1,x2,y2,score,class; two OVERLAP — the
        # end-to-end model already did NMS, both must be kept
        # (gstyolo26tensordecoder.c:371-397 has no NMS loop)
        t = np.array([[10, 10, 30, 26, 0.9, 0],
                      [11, 10, 31, 26, 0.8, 0],
                      [40, 40, 44, 44, 0.1, 1]], np.float32)
        dec = element_factory_make("yolo26tensordec",
                                   **{"score-threshold": 0.3})
        buf = _buf_with_tensors(np.zeros((48, 64), np.uint8), output=t)
        out = dec.host_process(buf)
        ods = relation_meta_of(out)[0].iter_mtds(ObjectDetectionMtd)
        assert len(ods) == 2
        assert ods[0].w == 20 and ods[0].h == 16


class TestYoloSeg:
    def test_mask_decode_and_crop(self):
        # detections: (4 box + 2 classes + 3 mask coeffs, 1 cand)
        det = np.zeros((9, 1), np.float32)
        det[:, 0] = [32, 24, 32, 32, 0.9, 0.1, 8.0, 0.0, 0.0]
        # protos (3, mh=12, mw=16): proto 0 active in left half
        protos = np.zeros((3, 12, 16), np.float32)
        protos[0, :, :8] = 1.0
        protos[0, :, 8:] = -1.0
        dec = element_factory_make("yolosegv8tensordec",
                                   **{"class-confidence-threshold": 0.5,
                                      "logits-tensor-id": "protos"})
        buf = _buf_with_tensors(np.zeros((48, 64), np.uint8),
                                output=det, protos=protos)
        out = dec.host_process(buf)
        rm = relation_meta_of(out)[0]
        ods = rm.iter_mtds(ObjectDetectionMtd)
        segs = rm.iter_mtds(SegmentationMtd)
        assert len(ods) == 1 and len(segs) == 1
        mask = segs[0].mask
        assert mask.shape == (12, 16)
        # box x:[16,48] of 64-wide -> proto cols [4,12); proto on for
        # cols < 8 -> mask cols [4,8).  box y:[8,40] of 48 -> rows [2,10)
        assert mask[2:10, 4:8].all()
        assert not mask[:, :4].any() and not mask[:, 8:].any()
        assert not mask[:2].any() and not mask[10:].any()

    def test_missing_protos_is_noop(self):
        det = np.zeros((9, 1), np.float32)
        dec = element_factory_make("yolosegv8tensordec")
        buf = _buf_with_tensors(np.zeros((48, 64), np.uint8),
                                output=det)
        out = dec.host_process(buf)
        assert relation_meta_of(out)[0].iter_mtds(SegmentationMtd) == []


class TestRotatedIou:
    def _box(self, x, y, w, h, ang):
        return {"x": x, "y": y, "w": w, "h": h, "angle": ang}

    def test_identity(self):
        a = self._box(0, 0, 10, 4, 0.3)
        assert _rotated_iou(a, a) > 0.999

    def test_disjoint(self):
        assert _rotated_iou(self._box(0, 0, 10, 4, 0.0),
                            self._box(100, 100, 10, 4, 1.0)) == 0.0

    def test_perpendicular_cross(self):
        # two 20x2 bars crossing at 90 deg: inter = 2*2 = 4,
        # union = 40+40-4 = 76
        a = self._box(-10, -1, 20, 2, 0.0)
        b = self._box(-10, -1, 20, 2, math.pi / 2)
        assert abs(_rotated_iou(a, b) - 4 / 76) < 1e-6

    def test_poly_area(self):
        sq = np.array([(0, 0), (4, 0), (4, 4), (0, 4)], float)
        assert _poly_area(sq) == 16.0


class TestYoloObb:
    def test_rotated_nms_and_rotation_field(self):
        # (4 + 2 classes + angle, 3): two same-angle overlapping
        # boxes (dup suppressed), one at 90deg crossing (kept: the
        # rotated IoU of crossing thin bars is tiny)
        t = np.zeros((7, 3), np.float32)
        t[:, 0] = [32, 24, 30, 4, 0.9, 0.1, 0.2]
        t[:, 1] = [33, 24, 30, 4, 0.85, 0.1, 0.2]
        t[:, 2] = [32, 24, 30, 4, 0.7, 0.1, 0.2 + math.pi / 2]
        dec = element_factory_make("yoloobbv8tensordec",
                                   **{"class-confidence-threshold": 0.5,
                                      "iou-threshold": 0.45})
        buf = _buf_with_tensors(np.zeros((48, 64), np.uint8), output=t)
        out = dec.host_process(buf)
        ods = relation_meta_of(out)[0].iter_mtds(ObjectDetectionMtd)
        assert len(ods) == 2
        angles = sorted(od.rotation for od in ods)
        assert abs(angles[0] - 0.2) < 1e-6
        assert abs(angles[1] - (0.2 + math.pi / 2)) < 1e-6


class TestFaceDetector:
    def test_decode(self):
        boxes = np.array([[0.1, 0.1, 0.3, 0.4],
                          [0.11, 0.1, 0.31, 0.4],    # dup -> NMS'd
                          [0.6, 0.5, 0.8, 0.9]], np.float32)
        scores = np.array([[0.1, 0.9], [0.2, 0.8],
                           [0.9, 0.1]], np.float32)  # last: background
        dec = element_factory_make("ultralightfacedetectortensordec",
                                   **{"score-threshold": 0.7})
        buf = _buf_with_tensors(np.zeros((48, 64), np.uint8),
                                boxes=boxes, scores=scores)
        out = dec.host_process(buf)
        ods = relation_meta_of(out)[0].iter_mtds(ObjectDetectionMtd)
        assert len(ods) == 1
        assert ods[0].label == "face"
        assert abs(ods[0].x - 0.1) < 1e-6
        assert abs(ods[0].w - 0.2) < 1e-6


def _seg_model(frames):
    det = np.zeros((9, 1), np.float32)
    det[:, 0] = [32, 24, 64, 48, 0.9, 0.1, 8.0, 0.0, 0.0]
    protos = np.zeros((3, 12, 16), np.float32)
    protos[0, :6] = 1.0
    protos[0, 6:] = -1.0
    return {"output": det, "protos": protos}


class TestSegmentationOverlayPipeline:
    def test_chain(self):
        register_model("toy-seg", _seg_model)
        p = parse_launch(
            "videotestsrc num-buffers=2 pattern=black ! "
            "video/x-raw,format=GRAY8,width=64,height=48 ! "
            "jaxinference model=toy-seg ! "
            "yolosegv8tensordec class-confidence-threshold=0.5 "
            "logits-tensor-id=protos ! "
            "segmentationoverlay alpha=1.0 ! appsink name=out")
        p.run()
        n = 0
        while (s := p.get_by_name("out").pull_sample()) is not None:
            frame = np.asarray(s.buffer.data)
            frame = frame.reshape(-1, 48, 64)
            # top half (mask rows) colorized away from black
            # (GRAY8 black = Y 16, limited range)
            assert frame[0, :20].max() > 60
            assert frame[0, 30:].max() <= 16
            n += 1
        assert n == 2
