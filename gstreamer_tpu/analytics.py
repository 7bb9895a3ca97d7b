"""Analytics / ML result metadata — the buffer-attached inference
results library.

TPU-native counterpart of gst-plugins-bad/gst-libs/gst/analytics/:
- GstAnalyticsRelationMeta (gstanalyticsmeta.c): a per-buffer graph of
  analytics results (Mtd records) with typed directed relations stored
  as an adjacency matrix; queries by relation path length
  (gst_analytics_relation_meta_exist) and direct-neighbor iteration.
- ODMtd (gstanalyticsobjectdetectionmtd.c): bounding box + confidence.
- ClsMtd (gstanalyticsclassificationmtd.c): (confidence, class) list.
- TrackingMtd (gstanalyticsobjecttrackingmtd.c): id, first/last seen,
  lost flag.
- SegmentationMtd (gstanalyticssegmentationmtd.c): mask array + region
  ids, semantic/instance type.
- GstTensor / TensorMeta (gsttensor.c, gsttensormeta.c): typed N-d
  tensors attached to a buffer.  Here the payload is a numpy/JAX
  array, so model outputs can stay in HBM and feed straight back into
  jitted post-processing.
- iou helpers (gstanalytics_image_util.c).

These integrate with the framework's Buffer.meta dict via attach()/
get_meta(); element meta transforms (core/meta.py) can scale OD boxes
with the frame like GstVideoCropMeta.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


class RelTypes(enum.IntFlag):
    """GstAnalyticsRelTypes (gstanalyticsmeta.h:198)."""
    NONE = 0
    IS_PART_OF = 1 << 1
    CONTAIN = 1 << 2
    RELATE_TO = 1 << 3
    N_TO_N = 1 << 4
    ANY = 0x7FFFFFFF


@dataclass
class Mtd:
    """GstAnalyticsMtd: a handle (meta, id) with typed payload."""
    meta: "RelationMeta"
    id: int

    @property
    def mtd_type(self) -> str:
        return self.meta._records[self.id][0]

    @property
    def data(self):
        return self.meta._records[self.id][1]


@dataclass
class ODData:
    """Object detection: gst_analytics_od_mtd_get_location
    (gstanalyticsobjectdetectionmtd.c)."""
    label: str
    x: int
    y: int
    w: int
    h: int
    confidence: float = -1.0          # location confidence level


@dataclass
class ClsData:
    """Classification: parallel (confidence, class-label) arrays."""
    levels: List[float]
    labels: List[str]

    def index_by_label(self, label: str) -> int:
        """gst_analytics_cls_mtd_get_index_by_quark."""
        try:
            return self.labels.index(label)
        except ValueError:
            return -1


@dataclass
class TrackingData:
    """gst_analytics_tracking_mtd_set: id + observation span."""
    tracking_id: int
    first_seen: int = 0               # ns
    last_seen: int = 0
    lost: bool = False

    def update_last_seen(self, ts: int) -> None:
        self.last_seen = ts

    def set_lost(self) -> None:
        self.lost = True


class SegmentationType(enum.IntEnum):
    """GstSegmentationType (gstanalyticssegmentationmtd.h:47)."""
    SEMANTIC = 0
    INSTANCE = 1


@dataclass
class SegmentationData:
    """Mask array whose values index region_ids
    (gst_analytics_segmentation_mtd_set semantics: masks may cover a
    sub-window of the frame at masks_loc)."""
    masks: Any                        # (h, w) integer array of region indices
    segmentation_type: SegmentationType
    region_ids: List[int]
    masks_loc_x: int = 0
    masks_loc_y: int = 0

    @property
    def region_count(self) -> int:
        return len(self.region_ids)

    def region_index(self, region_id: int) -> int:
        return self.region_ids.index(region_id)


class TensorDataType(enum.IntEnum):
    """GstTensorDataType (gsttensor.h:54) — subset used by numpy/JAX."""
    INT4 = 0
    INT8 = 1
    INT16 = 2
    INT32 = 3
    INT64 = 4
    UINT4 = 5
    UINT8 = 6
    UINT16 = 7
    UINT32 = 8
    UINT64 = 9
    FLOAT16 = 10
    FLOAT32 = 11
    FLOAT64 = 12
    BFLOAT16 = 13


_NP_TO_TDT = {
    np.dtype(np.int8): TensorDataType.INT8,
    np.dtype(np.int16): TensorDataType.INT16,
    np.dtype(np.int32): TensorDataType.INT32,
    np.dtype(np.int64): TensorDataType.INT64,
    np.dtype(np.uint8): TensorDataType.UINT8,
    np.dtype(np.uint16): TensorDataType.UINT16,
    np.dtype(np.uint32): TensorDataType.UINT32,
    np.dtype(np.uint64): TensorDataType.UINT64,
    np.dtype(np.float16): TensorDataType.FLOAT16,
    np.dtype(np.float32): TensorDataType.FLOAT32,
    np.dtype(np.float64): TensorDataType.FLOAT64,
}


class TensorDimOrder(enum.IntEnum):
    ROW_MAJOR = 0
    COL_MAJOR = 1


@dataclass
class Tensor:
    """GstTensor (gsttensor.h:186): id + typed dims + data.  data is a
    numpy or JAX array (device-resident allowed)."""
    id: str
    data: Any
    dims_order: TensorDimOrder = TensorDimOrder.ROW_MAJOR

    @property
    def data_type(self) -> TensorDataType:
        dt = np.dtype(getattr(self.data, "dtype", np.float32))
        if str(dt) == "bfloat16":
            return TensorDataType.BFLOAT16
        return _NP_TO_TDT[dt]

    @property
    def dims(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    def check(self, data_type: TensorDataType,
              dims: Sequence[int]) -> bool:
        """gst_tensor_check_type (gsttensor.h:230)."""
        return (self.data_type == data_type
                and tuple(dims) == self.dims)


@dataclass
class TensorMeta:
    """GstTensorMeta (gsttensormeta.h): ordered tensor list."""
    tensors: List[Tensor] = field(default_factory=list)

    def get_by_id(self, tid: str) -> Optional[Tensor]:
        for t in self.tensors:
            if t.id == tid:
                return t
        return None

    def index_from_id(self, tid: str) -> int:
        for i, t in enumerate(self.tensors):
            if t.id == tid:
                return i
        return -1


class RelationMeta:
    """GstAnalyticsRelationMeta (gstanalyticsmeta.c): Mtd store +
    relation adjacency (bitfield per ordered pair)."""

    MTD_OD = "object-detection"
    MTD_CLS = "classification"
    MTD_TRACKING = "tracking"
    MTD_SEGMENTATION = "segmentation"
    MTD_TENSOR = "tensor"

    def __init__(self):
        self._records: List[Tuple[str, Any]] = []
        self._rel: Dict[Tuple[int, int], int] = {}

    def __len__(self):
        return len(self._records)

    # -- record creation ------------------------------------------------

    def _add(self, mtd_type: str, data: Any) -> Mtd:
        self._records.append((mtd_type, data))
        return Mtd(self, len(self._records) - 1)

    def add_od_mtd(self, label: str, x: int, y: int, w: int, h: int,
                   confidence: float = -1.0) -> Mtd:
        return self._add(self.MTD_OD, ODData(label, x, y, w, h, confidence))

    def add_cls_mtd(self, levels: Sequence[float],
                    labels: Sequence[str]) -> Mtd:
        if len(levels) != len(labels):
            raise ValueError("levels and labels must pair up")
        return self._add(self.MTD_CLS, ClsData(list(levels), list(labels)))

    def add_one_cls_mtd(self, level: float, label: str) -> Mtd:
        return self.add_cls_mtd([level], [label])

    def add_tracking_mtd(self, tracking_id: int, first_seen: int = 0) -> Mtd:
        return self._add(self.MTD_TRACKING,
                         TrackingData(tracking_id, first_seen, first_seen))

    def add_segmentation_mtd(self, masks, segmentation_type,
                             region_ids: Sequence[int],
                             loc_x: int = 0, loc_y: int = 0) -> Mtd:
        return self._add(self.MTD_SEGMENTATION, SegmentationData(
            masks, SegmentationType(segmentation_type), list(region_ids),
            loc_x, loc_y))

    def add_tensor_mtd(self, tensor: Tensor) -> Mtd:
        return self._add(self.MTD_TENSOR, tensor)

    # -- relations --------------------------------------------------------

    def set_relation(self, rel: RelTypes, an_id: int, bn_id: int) -> None:
        """gst_analytics_relation_meta_set_relation."""
        self._rel[(an_id, bn_id)] = self._rel.get((an_id, bn_id), 0) | rel

    def get_relation(self, an_id: int, bn_id: int) -> RelTypes:
        return RelTypes(self._rel.get((an_id, bn_id), 0))

    def exist(self, an_id: int, bn_id: int, max_span: int = 1,
              cond_types: RelTypes = RelTypes.ANY) -> bool:
        """gst_analytics_relation_meta_exist: is there a path a->b of
        length <= max_span using only cond_types edges?"""
        frontier = {an_id}
        seen = set(frontier)
        for _ in range(max_span):
            nxt = set()
            for a in frontier:
                for (x, y), r in self._rel.items():
                    if x == a and (r & cond_types) and y not in seen:
                        if y == bn_id:
                            return True
                        nxt.add(y)
                        seen.add(y)
            if not nxt:
                return False
            frontier = nxt
        return False

    def get_direct_related(self, an_id: int,
                           relation: RelTypes = RelTypes.ANY,
                           mtd_type: Optional[str] = None) -> List[Mtd]:
        out = []
        for (x, y), r in self._rel.items():
            if x == an_id and (r & relation):
                if mtd_type is None or self._records[y][0] == mtd_type:
                    out.append(Mtd(self, y))
        return out

    # -- iteration --------------------------------------------------------

    def iterate(self, mtd_type: Optional[str] = None) -> Iterator[Mtd]:
        for i, (t, _) in enumerate(self._records):
            if mtd_type is None or t == mtd_type:
                yield Mtd(self, i)

    def get_mtd(self, an_id: int,
                mtd_type: Optional[str] = None) -> Optional[Mtd]:
        if 0 <= an_id < len(self._records):
            if mtd_type is None or self._records[an_id][0] == mtd_type:
                return Mtd(self, an_id)
        return None

    # -- buffer attach ------------------------------------------------------

    KEY = "analytics-relation"

    def attach(self, buf) -> "RelationMeta":
        """Attach to a framework Buffer (Buffer.meta dict), analog of
        gst_buffer_add_analytics_relation_meta."""
        buf.meta[self.KEY] = self
        return self

    @classmethod
    def from_buffer(cls, buf) -> Optional["RelationMeta"]:
        return buf.meta.get(cls.KEY)


def iou_int(x1: int, y1: int, w1: int, h1: int,
            x2: int, y2: int, w2: int, h2: int) -> float:
    """gst_analytics_image_util_iou_int
    (gstanalytics_image_util.c): intersection-over-union of two
    integer boxes."""
    xi = max(x1, x2)
    yi = max(y1, y2)
    xu = min(x1 + w1, x2 + w2)
    yu = min(y1 + h1, y2 + h2)
    if xu <= xi or yu <= yi:
        return 0.0
    inter = (xu - xi) * (yu - yi)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union if union else 0.0


def iou_float(x1, y1, w1, h1, x2, y2, w2, h2) -> float:
    """gst_analytics_image_util_iou_float."""
    return iou_int(x1, y1, w1, h1, x2, y2, w2, h2)


def batched_iou(boxes_a, boxes_b):
    """Vectorized all-pairs IoU for device post-processing (NMS etc.).

    boxes: (..., N, 4) as [x, y, w, h] (numpy or jnp).  Returns
    (..., Na, Nb).  Pure array math — jittable, runs on TPU."""
    import jax.numpy as jnp
    a = jnp.asarray(boxes_a, jnp.float32)
    b = jnp.asarray(boxes_b, jnp.float32)
    ax0, ay0 = a[..., :, None, 0], a[..., :, None, 1]
    ax1, ay1 = ax0 + a[..., :, None, 2], ay0 + a[..., :, None, 3]
    bx0, by0 = b[..., None, :, 0], b[..., None, :, 1]
    bx1, by1 = bx0 + b[..., None, :, 2], by0 + b[..., None, :, 3]
    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    union = (a[..., :, None, 2] * a[..., :, None, 3]
             + b[..., None, :, 2] * b[..., None, :, 3] - inter)
    return jnp.where(union > 0, inter / union, 0.0)
