"""Viola-Jones Haar cascade engine (clean-room).

The reference's facedetect/faceblur/handdetect elements
(gst-plugins-bad/ext/opencv/gstfacedetect.cpp:570, gstfaceblur.cpp:363,
gsthanddetect.cpp:418) call cv::CascadeClassifier::detectMultiScale
with user-supplied cascade XML profiles.  This module loads the same
OpenCV cascade XML format (the "new" <cascade> schema with HAAR
features and BOOST stages) and evaluates it fully vectorized:

* integral + squared-integral images once per scale
* every window position evaluated per stage as one array op, windows
  eliminated stage by stage (the cascade's early-exit, in bulk)
* per-window variance normalization: featval >= t * sqrt(var) * area
* image-pyramid scaling by `scale_factor` like detectMultiScale
* groupRectangles clustering with the eps=0.2 similarity rule and the
  min_neighbors vote

Tested against cv2.CascadeClassifier running the *same* XML (a
synthetic cascade built in the test) — detections agree on location.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["HaarCascade", "group_rectangles"]


@dataclass
class _Feature:
    rects: List[Tuple[int, int, int, int, float]]  # x, y, w, h, weight
    tilted: bool = False


@dataclass
class _WeakStump:
    feature: int
    threshold: float
    left: float
    right: float


@dataclass
class _Stage:
    threshold: float
    weaks: List[_WeakStump] = field(default_factory=list)


class HaarCascade:
    """OpenCV cascade XML (new schema) loader + vectorized detector."""

    def __init__(self, path: str):
        root = ET.parse(path).getroot()
        casc = root.find("cascade")
        if casc is None:
            raise ValueError("not an OpenCV cascade XML (no <cascade>)")
        if (casc.findtext("featureType") or "HAAR").strip() != "HAAR":
            raise ValueError("only HAAR featureType is supported")
        self.height = int(casc.findtext("height"))
        self.width = int(casc.findtext("width"))
        self.stages: List[_Stage] = []
        for st in casc.find("stages"):
            stage = _Stage(float(st.findtext("stageThreshold")))
            for wc in st.find("weakClassifiers"):
                nodes = (wc.findtext("internalNodes") or "").split()
                leaves = [float(v) for v in
                          (wc.findtext("leafValues") or "").split()]
                # stump: left right featidx threshold
                feat = int(nodes[2])
                thr = float(nodes[3])
                stage.weaks.append(_WeakStump(feat, thr, leaves[0],
                                              leaves[1]))
            self.stages.append(stage)
        self.features: List[_Feature] = []
        for fe in casc.find("features"):
            rects = []
            for r in fe.find("rects"):
                vals = r.text.split()
                rects.append((int(vals[0]), int(vals[1]), int(vals[2]),
                              int(vals[3]), float(vals[4])))
            tilted = (fe.findtext("tilted") or "0").strip() == "1"
            self.features.append(_Feature(rects, tilted))

    # -- evaluation ---------------------------------------------------------

    @staticmethod
    def _integrals(gray: np.ndarray):
        f = gray.astype(np.float64)
        ii = np.pad(np.cumsum(np.cumsum(f, 0), 1), ((1, 0), (1, 0)))
        sq = np.pad(np.cumsum(np.cumsum(f * f, 0), 1),
                    ((1, 0), (1, 0)))
        return ii, sq

    @staticmethod
    def _rect_sum(ii, ys, xs, y, x, h, w):
        return (ii[ys + y + h, xs + x + w] - ii[ys + y, xs + x + w]
                - ii[ys + y + h, xs + x] + ii[ys + y, xs + x])

    def _detect_single_scale(self, gray: np.ndarray,
                             step: int = 1) -> np.ndarray:
        """All passing base-size windows on `gray` -> (N, 2) y,x."""
        h, w = gray.shape
        wh, ww = self.height, self.width
        if h < wh or w < ww:
            return np.zeros((0, 2), np.int64)
        ii, sq = self._integrals(gray)
        ys0 = np.arange(0, h - wh + 1, step)
        xs0 = np.arange(0, w - ww + 1, step)
        ys, xs = np.meshgrid(ys0, xs0, indexing="ij")
        ys, xs = ys.ravel(), xs.ravel()
        area = float(wh * ww)
        wsum = self._rect_sum(ii, ys, xs, 0, 0, wh, ww)
        wsq = self._rect_sum(sq, ys, xs, 0, 0, wh, ww)
        var = wsq * area - wsum * wsum
        nf = np.sqrt(np.maximum(var, 0.0))
        nf = np.where(nf > 0, nf, 1.0)
        alive = np.ones(len(ys), bool)
        for stage in self.stages:
            if not alive.any():
                break
            idx = np.nonzero(alive)[0]
            cys, cxs = ys[idx], xs[idx]
            total = np.zeros(len(idx))
            for wk in stage.weaks:
                feat = self.features[wk.feature]
                fv = np.zeros(len(idx))
                for (x, y, rw, rh, wt) in feat.rects:
                    fv += wt * self._rect_sum(ii, cys, cxs, y, x,
                                              rh, rw)
                total += np.where(fv < wk.threshold * nf[idx],
                                  wk.left, wk.right)
            alive[idx[total < stage.threshold]] = False
        k = np.nonzero(alive)[0]
        return np.stack([ys[k], xs[k]], -1)

    def detect_multi_scale(self, gray: np.ndarray,
                           scale_factor: float = 1.1,
                           min_neighbors: int = 3,
                           min_size: Tuple[int, int] = (0, 0),
                           max_size: Tuple[int, int] = (0, 0)):
        """detectMultiScale analog -> list of (x, y, w, h)."""
        h, w = gray.shape
        rects = []
        scale = 1.0
        while True:
            ww = int(round(self.width * scale))
            wh = int(round(self.height * scale))
            if ww > w or wh > h:
                break
            if ((ww >= min_size[0] and wh >= min_size[1])
                    and (max_size[0] <= 0
                         or (ww <= max_size[0] and wh <= max_size[1]))):
                sw = max(int(round(w / scale)), 1)
                sh = max(int(round(h / scale)), 1)
                small = _resize_bilinear(gray, sh, sw)
                step = 1 if scale < 2.0 else 2
                hits = self._detect_single_scale(small, step)
                for (y, x) in hits:
                    rects.append((int(round(x * scale)),
                                  int(round(y * scale)), ww, wh))
            scale *= scale_factor
        return group_rectangles(rects, min_neighbors)


def _resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = img.shape
    if (oh, ow) == (h, w):
        return img
    ys = (np.arange(oh) + 0.5) * (h / oh) - 0.5
    xs = (np.arange(ow) + 0.5) * (w / ow) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    f = img.astype(np.float64)
    out = (f[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
           + f[np.ix_(y0, x1)] * (1 - fy) * fx
           + f[np.ix_(y1, x0)] * fy * (1 - fx)
           + f[np.ix_(y1, x1)] * fy * fx)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def group_rectangles(rects, min_neighbors: int, eps: float = 0.2):
    """cv::groupRectangles: union-find clustering under the relative
    similarity predicate, clusters smaller than min_neighbors+1 votes
    dropped, survivors averaged."""
    if not rects:
        return []
    n = len(rects)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def similar(a, b):
        delta = eps * (min(a[2], b[2]) + min(a[3], b[3])) * 0.5
        return (abs(a[0] - b[0]) <= delta and abs(a[1] - b[1]) <= delta
                and abs(a[0] + a[2] - b[0] - b[2]) <= delta
                and abs(a[1] + a[3] - b[1] - b[3]) <= delta)

    for i in range(n):
        for j in range(i + 1, n):
            if similar(rects[i], rects[j]):
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
    clusters = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(rects[i])
    out = []
    for members in clusters.values():
        if len(members) < max(min_neighbors, 1):
            continue
        m = np.asarray(members, np.float64)
        c = m.mean(0)
        out.append((int(round(c[0])), int(round(c[1])),
                    int(round(c[2])), int(round(c[3]))))
    return out
