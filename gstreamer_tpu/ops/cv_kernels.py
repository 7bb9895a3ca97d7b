"""OpenCV-semantics image kernels for the video-analysis element family.

Clean-room implementations of the OpenCV operations the reference's
opencv plugin calls (gst-plugins-bad/ext/opencv/gstopencv.cpp:56-77
registers the family; each element file names the cv:: call it wraps).
These reproduce the documented + empirically pinned cv2 math so the
elements can be tested bit-exactly against the system OpenCV oracle:

* rgb2gray_u8      — cvtColor COLOR_RGB2GRAY CV_8U fixed point
                     (R*9798 + G*19235 + B*3735 + 2^14) >> 15: bit-exact
* rgb2hsv_u8       — cvtColor COLOR_RGB2HSV CV_8U (H in 0..180) with the
                     12-bit reciprocal tables: bit-exact
* get_deriv_kernel — getDerivKernels: [-1,0,1]/[1,-2,1] base convolved
                     with [1,2,1] binomial smoothing passes
* sobel_u8 / laplacian_u8 — cv::Sobel / cv::Laplacian at CV_8U depth,
                     BORDER_REFLECT_101: bit-exact for ksize 1/3/5/7
* canny            — cv::Canny (L1 or L2): int NMS with the 2^15-scaled
                     tan(22.5deg)=13573 sector constants and 8-connected
                     hysteresis; bit-exact outside an aperture/2+1 border
                     frame (cv2 5.x treats the gradient border rows
                     slightly differently; documented test tolerance)
* erode_u8/dilate_u8 — cv::erode/cv::dilate, default 3x3 rect kernel,
                     iterations: bit-exact
* equalize_hist_u8 — cv::equalizeHist: bit-exact
* box_blur_u8      — cv::blur normalized box, reflect-101, half-up
                     rounding: bit-exact for odd kernels, +-1 for even
* gaussian_kernel / gaussian_blur_u8 — cv::GaussianBlur; sigma<=0 with
                     ksize 3/5/7 uses the fixed binomial kernels on an
                     integer path (bit-exact); arbitrary sigma is the
                     float kernel with half-up rounding (+-1 vs cv2's
                     float32 two-pass intermediate rounding)
* median_blur_u8   — cv::medianBlur (BORDER_REPLICATE): bit-exact
* bilateral_u8     — cv::bilateralFilter with the element's call shape
                     (d=-1, sigma_space=0 -> d=5): the published float
                     algorithm (cv2 5.x ships a fixed-point
                     approximation; ours agrees within +-2 on smooth
                     content and is behaviorally edge-preserving)

All functions take `xp` (numpy or jax.numpy) and operate batched over
the last two axes (..., H, W).  Rounding helper `_up8` is half-up
(floor(x+0.5)) which is what OpenCV's fixed-point u8 paths do.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "rgb2gray_u8", "rgb2hsv_u8", "get_deriv_kernel", "sep_filter",
    "sobel_u8", "laplacian_u8", "canny", "erode_u8", "dilate_u8",
    "equalize_hist_u8", "box_blur_u8", "gaussian_kernel",
    "gaussian_blur_u8", "gaussian_blur_f32", "median_blur_u8",
    "bilateral_u8",
]


def _up8(xp, x):
    """OpenCV u8 saturation with half-up rounding."""
    return xp.clip(xp.floor(x + 0.5), 0, 255).astype(xp.uint8)


def rgb2gray_u8(xp, r, g, b):
    """COLOR_RGB2GRAY CV_8U: 15-bit fixed point, bit-exact vs cv2."""
    r = r.astype(xp.int32)
    g = g.astype(xp.int32)
    b = b.astype(xp.int32)
    return ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15) \
        .astype(xp.uint8)


# 12-bit reciprocal tables (imgproc color_hsv: sdiv/hdiv construction)
_SDIV = np.zeros(256, np.int32)
_HDIV = np.zeros(256, np.int32)
for _i in range(1, 256):
    _SDIV[_i] = int(math.floor((255 << 12) / _i + 0.5))
    _HDIV[_i] = int(math.floor((180 << 12) / (6.0 * _i) + 0.5))


def rgb2hsv_u8(xp, r, g, b):
    """COLOR_RGB2HSV CV_8U (H 0..180): bit-exact vs cv2."""
    r = r.astype(xp.int32)
    g = g.astype(xp.int32)
    b = b.astype(xp.int32)
    v = xp.maximum(xp.maximum(r, g), b)
    mn = xp.minimum(xp.minimum(r, g), b)
    diff = v - mn
    sdiv = xp.asarray(_SDIV)
    hdiv = xp.asarray(_HDIV)
    s = (diff * sdiv[v] + (1 << 11)) >> 12
    vr = v == r
    vg = (~vr) & (v == g)
    hraw = xp.where(vr, g - b,
                    xp.where(vg, b - r + 2 * diff, r - g + 4 * diff))
    h = (hraw * hdiv[diff] + (1 << 11)) >> 12
    h = xp.where(h < 0, h + 180, h)
    return (h.astype(xp.uint8), s.astype(xp.uint8), v.astype(xp.uint8))


def get_deriv_kernel(order: int, ksize: int) -> np.ndarray:
    """getDerivKernels 1-D kernel (trace-time constant).

    order-0 base [1], order-1 base [-1,0,1], order-2 base [1,-2,1],
    each convolved with [1,2,1] until the length reaches ksize
    (ksize 1 behaves as 3 for derivative orders, matching cv2).
    """
    if order == 0:
        base, n = np.array([1.0]), (max(ksize, 1) - 1) // 2
    elif order == 1:
        base, n = np.array([-1.0, 0.0, 1.0]), (max(ksize, 3) - 3) // 2
    elif order == 2:
        base, n = np.array([1.0, -2.0, 1.0]), (max(ksize, 3) - 3) // 2
    else:
        raise ValueError("derivative order must be 0, 1 or 2")
    k = base
    for _ in range(n):
        k = np.convolve(k, [1.0, 2.0, 1.0])
    return k


def _pad2(xp, img, ry, rx, mode):
    if ry == 0 and rx == 0:
        return img
    widths = [(0, 0)] * (img.ndim - 2) + [(ry, ry), (rx, rx)]
    return xp.pad(img, widths, mode=mode)


def sep_filter(xp, img_f, kx, ky, border="reflect"):
    """Separable correlation over the last two axes.

    `border` is the numpy pad mode: "reflect" = BORDER_REFLECT_101,
    "edge" = BORDER_REPLICATE.  Taps are baked Python floats so the
    whole filter fuses into one XLA expression.
    """
    h, w = img_f.shape[-2], img_f.shape[-1]
    rx, ry = len(kx) // 2, len(ky) // 2
    p = _pad2(xp, img_f, 0, rx, border)
    out = sum(float(c) * p[..., :, i:i + w] for i, c in enumerate(kx))
    p = _pad2(xp, out, ry, 0, border)
    return sum(float(c) * p[..., j:j + h, :] for j, c in enumerate(ky))


def sobel_u8(xp, gray, dx: int, dy: int, ksize: int = 3):
    """cv::Sobel(CV_8U, dx, dy, ksize), reflect-101: bit-exact."""
    kx = get_deriv_kernel(dx, ksize)
    ky = get_deriv_kernel(dy, ksize)
    return _up8(xp, sep_filter(xp, gray.astype(xp.float32), kx, ky))


def laplacian_u8(xp, gray, ksize: int = 3, scale: float = 1.0,
                 shift: float = 0.0):
    """cv::Laplacian(CV_8U) then convertTo(scale, shift) as the
    reference cvlaplace does (gstcvlaplace.cpp transform): bit-exact."""
    f = gray.astype(xp.float32)
    if ksize == 1:
        h, w = gray.shape[-2], gray.shape[-1]
        p = _pad2(xp, f, 1, 1, "reflect")
        acc = (p[..., :-2, 1:-1] + p[..., 2:, 1:-1] + p[..., 1:-1, :-2]
               + p[..., 1:-1, 2:] - 4.0 * p[..., 1:-1, 1:-1])
    else:
        acc = (sep_filter(xp, f, get_deriv_kernel(2, ksize),
                          get_deriv_kernel(0, ksize))
               + sep_filter(xp, f, get_deriv_kernel(0, ksize),
                            get_deriv_kernel(2, ksize)))
    out = _up8(xp, acc)
    if scale != 1.0 or shift != 0.0:
        out = _up8(xp, out.astype(xp.float32) * scale + shift)
    return out


def _hysteresis_np(strong, weak):
    out = strong.copy()
    h, w = strong.shape[-2], strong.shape[-1]
    while True:
        p = np.pad(out, [(0, 0)] * (out.ndim - 2) + [(1, 1), (1, 1)])
        grown = np.zeros_like(out)
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                grown |= p[..., di:di + h, dj:dj + w]
        nxt = grown & weak
        if (nxt == out).all():
            return nxt
        out = nxt


def _hysteresis_jax(xp, strong, weak):
    import jax
    h, w = strong.shape[-2], strong.shape[-1]

    def grow(out):
        p = xp.pad(out, [(0, 0)] * (out.ndim - 2) + [(1, 1), (1, 1)])
        g = out
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                g = g | p[..., di:di + h, dj:dj + w]
        return g & weak

    def cond(state):
        out, changed = state
        return changed

    def body(state):
        out, _ = state
        nxt = grow(out)
        return nxt, xp.any(nxt != out)

    out, _ = jax.lax.while_loop(cond, body,
                                (strong, xp.asarray(True)))
    return out


def canny(xp, gray, threshold1: float, threshold2: float,
          aperture: int = 3, l2gradient: bool = False):
    """cv::Canny on a u8 gray image -> u8 {0,255} edge map.

    Int-exact NMS per the published algorithm: sector selection by
    |dy|<<15 vs |dx|*13573 (tan 22.5 deg) and |dx|*(13573+2<<15)
    (tan 67.5 deg); horizontal/vertical compare >/>=, diagonals
    strict/strict with the orientation picked by sign(dx*dy); then
    8-connected hysteresis from strong (>high) through weak (>low)
    NMS survivors.  Bit-exact vs cv2 outside an aperture/2+1 frame.
    """
    lo = min(threshold1, threshold2)
    hi = max(threshold1, threshold2)
    if l2gradient:
        lo, hi = lo * lo, hi * hi
    kd = get_deriv_kernel(1, aperture)
    ks = get_deriv_kernel(0, aperture)
    f = gray.astype(xp.float32)
    dx = sep_filter(xp, f, kd, ks)
    dy = sep_filter(xp, f, ks, kd)
    mag = (dx * dx + dy * dy) if l2gradient else (xp.abs(dx) + xp.abs(dy))
    h, w = gray.shape[-2], gray.shape[-1]
    m = xp.pad(mag, [(0, 0)] * (mag.ndim - 2) + [(1, 1), (1, 1)])
    c = m[..., 1:-1, 1:-1]
    nb = {(di, dj): m[..., 1 + di:1 + di + h, 1 + dj:1 + dj + w]
          for di in (-1, 0, 1) for dj in (-1, 0, 1)}
    adx, ady = xp.abs(dx), xp.abs(dy)
    tg22x = adx * 13573.0
    tg67x = tg22x + adx * float(2 << 15)
    ya = ady * float(1 << 15)
    hm = (c > nb[(0, -1)]) & (c >= nb[(0, 1)])
    vm = (c > nb[(-1, 0)]) & (c >= nb[(1, 0)])
    d1 = (c > nb[(-1, -1)]) & (c > nb[(1, 1)])
    d2 = (c > nb[(-1, 1)]) & (c > nb[(1, -1)])
    dm = xp.where(xp.sign(dx) * xp.sign(dy) >= 0, d1, d2)
    keep = xp.where(ya < tg22x, hm, xp.where(ya > tg67x, vm, dm))
    strong = keep & (c > hi)
    weak = keep & (c > lo)
    if xp is np:
        out = _hysteresis_np(strong, weak)
    else:
        out = _hysteresis_jax(xp, strong, weak)
    return xp.where(out, xp.uint8(255), xp.uint8(0))


def _morph(xp, img, iterations, is_dilate):
    """3x3 rect erode/dilate; border behaves like cv's +-inf constant."""
    h, w = img.shape[-2], img.shape[-1]
    fill = 0 if is_dilate else 255
    red = xp.maximum if is_dilate else xp.minimum
    out = img
    for _ in range(max(int(iterations), 0)):
        widths = [(0, 0)] * (img.ndim - 2) + [(1, 1), (1, 1)]
        p = xp.pad(out, widths, mode="constant", constant_values=fill)
        acc = p[..., 0:h, 0:w]
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                if di == 0 and dj == 0:
                    continue
                acc = red(acc, p[..., di:di + h, dj:dj + w])
        out = acc
    return out


def erode_u8(xp, img, iterations: int = 1):
    """cv::erode default 3x3 kernel: bit-exact."""
    return _morph(xp, img, iterations, is_dilate=False)


def dilate_u8(xp, img, iterations: int = 1):
    """cv::dilate default 3x3 kernel: bit-exact."""
    return _morph(xp, img, iterations, is_dilate=True)


def equalize_hist_u8(xp, gray):
    """cv::equalizeHist per 2-D image of the batch: bit-exact.

    lut[i] = round_half_up((cdf[i]-cdf_first)*255/(N-cdf_first)).
    Batched: histogram per leading index via one-hot sum.
    """
    flat = gray.reshape(gray.shape[:-2] + (-1,)).astype(xp.int32)
    n = flat.shape[-1]
    if xp is np:
        lead = flat.reshape(-1, n)
        hist = np.stack([np.bincount(row, minlength=256)
                         for row in lead]).reshape(flat.shape[:-1]
                                                   + (256,))
    else:
        import jax

        def hist1(row):
            return xp.zeros(256, xp.int32).at[row].add(1)

        lead = flat.reshape(-1, n)
        hist = jax.vmap(hist1)(lead).reshape(flat.shape[:-1] + (256,))
    cdf = xp.cumsum(hist, axis=-1)
    nonzero = cdf > 0
    # first nonzero cdf value = hist value at first occupied bin
    first_idx = xp.argmax(nonzero, axis=-1)
    first = xp.take_along_axis(cdf, first_idx[..., None], axis=-1)
    denom = xp.maximum(n - first, 1)
    lut = xp.clip(xp.floor((cdf - first) * (255.0 / denom) + 0.5),
                  0, 255).astype(xp.uint8)
    out = xp.take_along_axis(lut, flat, axis=-1)
    return out.reshape(gray.shape)


def box_blur_u8(xp, img, kw: int, kh: int):
    """cv::blur normalized box, anchor (-1,-1), reflect-101.

    Bit-exact for odd kernels (integer sum, half-up); even kernels can
    differ by +-1 from cv2's vectorized path on ~5% of pixels.
    """
    h, w = img.shape[-2], img.shape[-1]
    lx, rx = kw // 2, kw - 1 - kw // 2
    ly, ry = kh // 2, kh - 1 - kh // 2
    widths = [(0, 0)] * (img.ndim - 2) + [(ly, ry), (lx, rx)]
    p = xp.pad(img.astype(xp.int32), widths, mode="reflect")
    c = xp.cumsum(xp.cumsum(p, axis=-2), axis=-1)
    c = xp.pad(c, [(0, 0)] * (img.ndim - 2) + [(1, 0), (1, 0)])
    s = (c[..., kh:, kw:] - c[..., :-kh, kw:]
         - c[..., kh:, :-kw] + c[..., :-kh, :-kw])
    n = kw * kh
    return xp.clip((s + n // 2) // n, 0, 255).astype(xp.uint8)


# getGaussianKernel fixed small kernels (ksize<=7 and sigma<=0)
_FIXED_GAUSS = {
    1: [1.0],
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
        0.03125],
}


def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv::getGaussianKernel (trace-time constant)."""
    if sigma <= 0:
        if ksize in _FIXED_GAUSS:
            return np.array(_FIXED_GAUSS[ksize])
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize) - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur_u8(xp, img, ksize: int, sigma: float = 0.0,
                     ksize_y: int = 0, sigma_y: float = 0.0):
    """cv::GaussianBlur on u8; Size(kw, kh) where kh=0 copies kw.

    Fixed small kernels run on an exact integer path (bit-exact vs
    cv2); arbitrary sigma uses the float kernel with half-up rounding
    (+-1 vs cv2).
    """
    kh = ksize_y or ksize
    sy = sigma_y if sigma_y > 0 else sigma
    kx = gaussian_kernel(ksize, sigma)
    ky = gaussian_kernel(kh, sy) if (kh != ksize or sy != sigma) else kx
    if (sigma <= 0 and ksize in _FIXED_GAUSS and kh in _FIXED_GAUSS
            and (sigma_y <= 0)):
        # integer path: binomial taps scaled to ints, one rounding
        h, w = img.shape[-2], img.shape[-1]
        ix = np.round(kx * (1 << (len(kx) - 1))).astype(np.int64)
        iy = np.round(ky * (1 << (len(ky) - 1))).astype(np.int64)
        shift = (len(kx) - 1) + (len(ky) - 1)
        f = img.astype(xp.int32)
        p = _pad2(xp, f, 0, len(kx) // 2, "reflect")
        out = sum(int(c) * p[..., :, i:i + w] for i, c in enumerate(ix))
        p = _pad2(xp, out, len(ky) // 2, 0, "reflect")
        out = sum(int(c) * p[..., j:j + h, :] for j, c in enumerate(iy))
        half = 1 << (shift - 1) if shift else 0
        return xp.clip((out + half) >> shift, 0, 255).astype(xp.uint8)
    return _up8(xp, sep_filter(xp, img.astype(xp.float32), kx, ky))


def gaussian_blur_f32(xp, img_f, ksize: int, sigma: float = 0.0):
    """cv::GaussianBlur on CV_32F (retinex's case)."""
    k = gaussian_kernel(ksize, sigma)
    return sep_filter(xp, img_f, k, k)


def median_blur_u8(xp, img, ksize: int):
    """cv::medianBlur (BORDER_REPLICATE): bit-exact for odd ksize."""
    h, w = img.shape[-2], img.shape[-1]
    r = ksize // 2
    p = _pad2(xp, img, r, r, "edge")
    win = xp.stack([p[..., i:i + h, j:j + w]
                    for i in range(ksize) for j in range(ksize)],
                   axis=-1)
    s = xp.sort(win, axis=-1)
    return s[..., (ksize * ksize) // 2]


def bilateral_u8(xp, planes, sigma_color: float, sigma_space: float = 0.0,
                 d: int = -1):
    """cv::bilateralFilter with the cvsmooth call shape
    (bilateralFilter(img, out, -1, color, 0)): d computed from
    sigma_space, L1 color distance across channels, float weights.

    `planes` is a sequence of (..., H, W) channel arrays (1 for gray,
    3 for RGB); returns the filtered planes as a tuple.  Matches cv2
    within +-1 (float exp evaluation differs from cv2's tables).
    """
    if sigma_color <= 0:
        sigma_color = 1.0
    if sigma_space <= 0:
        sigma_space = 1.0
    if d <= 0:
        radius = int(round(sigma_space * 1.5))
    else:
        radius = d // 2
    radius = max(radius, 1)
    gauss_color = -0.5 / (sigma_color * sigma_color)
    gauss_space = -0.5 / (sigma_space * sigma_space)
    h, w = planes[0].shape[-2], planes[0].shape[-1]
    fs = [pl.astype(xp.float32) for pl in planes]
    ps = [_pad2(xp, f, radius, radius, "reflect") for f in fs]
    nums = [xp.zeros_like(f) for f in fs]
    den = None
    for di in range(-radius, radius + 1):
        for dj in range(-radius, radius + 1):
            rr = di * di + dj * dj
            if rr > radius * radius:
                continue
            sw = math.exp(gauss_space * rr)
            nbrs = [p[..., di + radius:di + radius + h,
                      dj + radius:dj + radius + w] for p in ps]
            cdist = sum(xp.abs(nbr - f) for nbr, f in zip(nbrs, fs))
            wgt = sw * xp.exp(gauss_color * cdist * cdist)
            nums = [n + wgt * nbr for n, nbr in zip(nums, nbrs)]
            den = wgt if den is None else den + wgt
    return tuple(_up8(xp, n / den) for n in nums)


# ---------------------------------------------------------------------------
# Batch-2 kernels (analysis elements)
# ---------------------------------------------------------------------------

_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down_u8(xp, img):
    """cv::pyrDown: 5-tap [1,4,6,4,1]/16 gaussian (reflect-101) then
    even-index decimation -> ceil(n/2) output: bit-exact vs cv2."""
    bl = sep_filter(xp, img.astype(xp.float32), _PYR_K, _PYR_K)
    return _up8(xp, bl[..., ::2, ::2])


def adaptive_threshold_gaussian_u8(xp, img, block_size: int, C: float,
                                   inv: bool = True, maxval: int = 255):
    """cv::adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C): threshold is
    the local gaussian mean (getGaussianKernel(block, -1), BORDER_
    REPLICATE, rounded to u8) minus C: bit-exact vs cv2."""
    k = gaussian_kernel(block_size, 0.0)
    mean = xp.clip(xp.floor(sep_filter(xp, img.astype(xp.float32), k, k,
                                       border="edge") + 0.5), 0, 255)
    above = img.astype(xp.float32) > (mean - C)
    hi, lo = (0, maxval) if inv else (maxval, 0)
    return xp.where(above, xp.uint8(hi), xp.uint8(lo))


def match_template(xp, img, templ, method: int):
    """cv::matchTemplate methods 0-5 (SQDIFF, SQDIFF_NORMED, CCORR,
    CCORR_NORMED, CCOEFF, CCOEFF_NORMED) on single-channel u8 input;
    ~1e-7 relative agreement with cv2, identical arg-min/max.

    The cross-correlation term runs as one convolution (an MXU matmul
    on TPU via lax.conv); the window sums come from integral images,
    so the whole score map is O(HW) + one conv regardless of method.
    """
    f = img.astype(xp.float32)
    t = templ.astype(xp.float32)
    th, tw = t.shape[-2], t.shape[-1]
    n = float(th * tw)
    if xp is np:
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(f, (th, tw))
        cross = (win * t).sum((-2, -1))
    else:
        import jax

        cross = jax.lax.conv_general_dilated(
            f[None, None], t[None, None], (1, 1), "VALID")[0, 0]
    # window sums via integral images
    c1 = xp.cumsum(xp.cumsum(f, axis=-2), axis=-1)
    c1 = xp.pad(c1, [(1, 0), (1, 0)])
    s1 = (c1[th:, tw:] - c1[:-th, tw:] - c1[th:, :-tw]
          + c1[:-th, :-tw])
    f2 = f * f
    c2 = xp.cumsum(xp.cumsum(f2, axis=-2), axis=-1)
    c2 = xp.pad(c2, [(1, 0), (1, 0)])
    s2 = (c2[th:, tw:] - c2[:-th, tw:] - c2[th:, :-tw]
          + c2[:-th, :-tw])
    tsum = t.sum()
    tsq = (t * t).sum()
    eps = 1e-12
    if method == 0:                       # TM_SQDIFF
        return s2 - 2.0 * cross + tsq
    if method == 1:                       # TM_SQDIFF_NORMED
        return (s2 - 2.0 * cross + tsq) / xp.sqrt(s2 * tsq + eps)
    if method == 2:                       # TM_CCORR
        return cross
    if method == 3:                       # TM_CCORR_NORMED
        return cross / xp.sqrt(s2 * tsq + eps)
    if method == 4:                       # TM_CCOEFF
        return cross - s1 * (tsum / n)
    if method == 5:                       # TM_CCOEFF_NORMED
        num = cross - s1 * (tsum / n)
        den = xp.sqrt(xp.maximum((s2 - s1 * s1 / n), 0.0)
                      * (tsq - tsum * tsum / n) + eps)
        return num / den
    raise ValueError("method must be 0..5")


def match_template_multi(xp, channels, tchannels, method: int):
    """cv::matchTemplate on multi-channel images: the cross terms and
    window/template norms sum over channels BEFORE normalization
    (matchTemplate docs; validated vs cv2 on 3-channel u8)."""
    th, tw = tchannels[0].shape[-2], tchannels[0].shape[-1]
    n = float(th * tw)
    crosses, s1s, s2s, tsums, tsqs = [], [], [], [], []
    for img, t in zip(channels, tchannels):
        f = img.astype(xp.float32)
        tf = t.astype(xp.float32)
        if xp is np:
            from numpy.lib.stride_tricks import sliding_window_view

            win = sliding_window_view(f, (th, tw))
            c = (win * tf).sum((-2, -1))
        else:
            import jax

            c = jax.lax.conv_general_dilated(
                f[None, None], tf[None, None], (1, 1), "VALID")[0, 0]
        c1 = xp.cumsum(xp.cumsum(f, axis=-2), axis=-1)
        c1 = xp.pad(c1, [(1, 0), (1, 0)])
        a1 = (c1[th:, tw:] - c1[:-th, tw:] - c1[th:, :-tw]
              + c1[:-th, :-tw])
        f2 = f * f
        c2 = xp.cumsum(xp.cumsum(f2, axis=-2), axis=-1)
        c2 = xp.pad(c2, [(1, 0), (1, 0)])
        a2 = (c2[th:, tw:] - c2[:-th, tw:] - c2[th:, :-tw]
              + c2[:-th, :-tw])
        crosses.append(c)
        s1s.append(a1)
        s2s.append(a2)
        tsums.append(tf.sum())
        tsqs.append((tf * tf).sum())
    cross = sum(crosses)
    s2 = sum(s2s)
    tsq = sum(tsqs)
    eps = 1e-12
    if method == 0:
        return s2 - 2.0 * cross + tsq
    if method == 1:
        return (s2 - 2.0 * cross + tsq) / xp.sqrt(s2 * tsq + eps)
    if method == 2:
        return cross
    if method == 3:
        return cross / xp.sqrt(s2 * tsq + eps)
    # CCOEFF variants subtract PER-CHANNEL means (matchTemplate docs)
    num = sum(crosses[c] - s1s[c] * (tsums[c] / n)
              for c in range(len(channels)))
    if method == 4:
        return num
    if method == 5:
        wvar = s2 - sum(a1 * a1 for a1 in s1s) / n
        tvar = tsq - sum(ts * ts for ts in tsums) / n
        return num / xp.sqrt(xp.maximum(wvar, 0.0) * tvar + eps)
    raise ValueError("method must be 0..5")
