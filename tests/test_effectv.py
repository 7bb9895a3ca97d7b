"""EffecTV elements vs scalar transliterations of the C kernels."""

import math

import numpy as np
import pytest

from gstreamer_tpu.core.parse import parse_launch


def _run_elem(factory, frames_words, w, h, props=""):
    """Push word frames through the element via appsrc."""
    from gstreamer_tpu.core.buffer import Buffer
    pipe = parse_launch(
        f"appsrc name=in caps=video/x-raw,format=BGRx,width={w},height={h},"
        f"framerate=30/1 ! {factory} {props} name=fx ! appsink name=out")
    src = pipe.get_by_name("in")
    for k, wf in enumerate(frames_words):
        planes = (((wf >> 16) & 0xFF).astype(np.uint8)[None],
                  ((wf >> 8) & 0xFF).astype(np.uint8)[None],
                  (wf & 0xFF).astype(np.uint8)[None],
                  np.zeros((1, h, w), np.uint8))
        src.push_buffer(Buffer(data=planes, pts=k * 33333333,
                               duration=33333333))
    src.end_of_stream()
    pipe.run()
    sink = pipe.get_by_name("out")
    outs = []
    while True:
        s = sink.pull_sample()
        if s is None:
            break
        d = s.buffer.data
        r, g, b = (np.asarray(d[i]).astype(np.int64) for i in range(3))
        for k in range(r.shape[0]):
            outs.append((r[k] << 16) | (g[k] << 8) | b[k])
    return outs


def _edge_gold(frames, w, h):
    """Scalar transliteration of gst_edgetv_transform_frame."""
    mw, mh = w // 4, h // 4
    gmap = np.zeros(mh * mw * 2, np.int64)
    outs = []
    for f in frames:
        src = f.reshape(-1)
        dest = np.zeros(w * h, np.int64)
        base = w * 4 + 4
        si = base
        for y in range(1, mh - 1):
            for x in range(1, mw - 1):
                p = int(src[si])
                q = int(src[si - 1])

                def dm(p, q):
                    r = ((p & 0xFF0000) - (q & 0xFF0000)) >> 16
                    g = ((p & 0xFF00) - (q & 0xFF00)) >> 8
                    b = (p & 0xFF) - (q & 0xFF)
                    r = min((r * r) >> 5, 127)
                    g = min((g * g) >> 5, 127)
                    b = min((b * b) >> 4, 255)
                    return (r << 17) | (g << 9) | b

                v2 = dm(p, q)
                v3 = dm(p, int(src[si - w]))
                v0 = int(gmap[(y - 1) * mw * 2 + x * 2])
                v1 = int(gmap[y * mw * 2 + (x - 1) * 2 + 1])
                gmap[y * mw * 2 + x * 2] = v2
                gmap[y * mw * 2 + x * 2 + 1] = v3

                def sat(a, b):
                    r = a + b
                    g = r & 0x01010100
                    return r | (g - (g >> 8))

                dest[si] = sat(v0, v1)
                dest[si + 1] = sat(v0, v3)
                dest[si + 2] = v3
                dest[si + 3] = v3
                dest[si + w] = sat(v2, v1)
                dest[si + w + 1] = sat(v2, v3)
                dest[si + w + 2] = v3
                dest[si + w + 3] = v3
                si += 4
            si += w * 3 + 8 + (w % 4)
        outs.append(dest.reshape(h, w) & 0xFFFFFFFF)
    return outs


class TestEdgeTV:
    def test_matches_scalar_gold(self):
        rng = np.random.RandomState(0)
        w, h = 32, 24
        frames = [rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
                  for _ in range(3)]
        got = _run_elem("edgetv", frames, w, h)
        gold = _edge_gold(frames, w, h)
        for a, b in zip(got, gold):
            # compare RGB bits only: the C also writes carry bits into
            # the BGRx padding byte, which is don't-care data our
            # canonical component planes do not carry
            assert np.array_equal(a & 0xFFFFFF, b & 0xFFFFFF)


class TestStreakTV:
    def test_afterimage_accumulates(self):
        w, h = 16, 8
        bright = np.full((h, w), 0xF8F8F8, np.int64)
        dark = np.zeros((h, w), np.int64)
        frames = [bright] + [dark] * 5
        got = _run_elem("streaktv", frames, w, h)
        # frame 0: bright/8 summed once = bright>>3
        assert got[0][0, 0] == (0xF8F8F8 & 0xF8F8F8) >> 3
        # cf = plane & 3: the bright plane 0 re-enters the sum every 4th
        # frame (cf == 0) until overwritten 32 frames later
        assert got[3][0, 0] == 0
        assert got[4][0, 0] == 0xF8F8F8 >> 3
        assert got[5][0, 0] == 0


class TestVertigoTV:
    def test_scalar_gold_one_frame(self):
        w, h = 16, 12
        rng = np.random.RandomState(1)
        f = rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
        got = _run_elem("vertigotv", [f], w, h)[0]
        # gold: phase=0 parms, current buffer zeros
        phase = 0.0
        dizz = math.sin(phase) * 10 + math.sin(phase * 1.9 + 5) * 5
        x, y = w / 2, h / 2
        t = (x * x + y * y) * 1.01
        dizz = min(dizz, x) if dizz >= 0 else max(dizz, -x)
        vx = (x * (x - dizz) + y * y) / t
        vy = (dizz * y) / t
        dx, dy = int(vx * 65536), int(vy * 65536)
        sx = int((-vx * x + vy * y + x + math.cos(0.0) * 2) * 65536)
        sy = int((-vx * y - vy * x + y + math.sin(0.0) * 2) * 65536)
        gold = np.zeros((h, w), np.int64)
        for yy in range(h):
            ox, oy = sx, sy
            for xx in range(w):
                # current buffer is zero -> v = src & 0xFCFCFF
                gold[yy, xx] = (f[yy, xx] & 0xFCFCFF) >> 2
                ox += dx
                oy += dy
            sx -= dy
            sy += dx
        assert np.array_equal(got, gold)


class TestQuarkTV:
    def test_first_frame_mixes_only_src(self):
        w, h = 8, 6
        rng = np.random.RandomState(2)
        f0 = rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
        got = _run_elem("quarktv", [f0], w, h)[0]
        # with a single frame in the table every drawn plane is either
        # the current frame or empty (-> src); output == input
        assert np.array_equal(got, f0)

    def test_matches_scalar_gold(self):
        # scalar transliteration of gst_quarktv_transform_frame with the
        # shared fastrand state starting at 0
        w, h = 32, 24
        area = w * h
        rng = np.random.RandomState(3)
        frames = [rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
                  for _ in range(3)]
        got = _run_elem("quarktv", frames, w, h)

        state = 0
        table = [None] * 16
        current = 15
        gold = []
        for f in frames:
            src = f.reshape(-1)
            table[current] = src.copy()
            dest = src.copy()
            i = area
            while True:
                i -= 1
                if i == 0:
                    break
                state = (state * 1103515245 + 12345) & 0xFFFFFFFF
                pl = table[(current + (state >> 24)) % 16]
                if pl is not None:
                    dest[i] = pl[i]
            gold.append(dest.reshape(h, w))
            current -= 1
            if current < 0:
                current = 15
        for a, b in zip(got, gold):
            assert np.array_equal(a, b)


class TestShagadelicRev:
    def test_shagadelic_runs_and_masks(self):
        w, h = 16, 8
        f = np.full((h, w), 0xFFFFFF, np.int64)
        got = _run_elem("shagadelictv", [f], w, h)[0]
        # output only contains maskable bits of v (per-channel 0 or
        # saturated channel values)
        assert got.shape == (h, w)
        assert int(got.max()) <= 0xFFFFFF

    def test_revtv_draws_waveform(self):
        # black frame: yval = y - 0, lines at y = 6 (linespace) light up
        # their own row; y = 0 fails the yval > 0 test
        w, h = 16, 12
        f = np.zeros((h, w), np.int64)
        got = _run_elem("revtv", [f], w, h)[0]
        assert np.all(got[6] == 0xFFFFFFFF & 0xFFFFFF)
        assert np.all(got[0] == 0)
        assert np.all(got[5] == 0)


class TestDiceWarp:
    def test_dicetv_matches_scalar_gold(self):
        w, h = 32, 32
        rng = np.random.RandomState(5)
        f = rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
        got = _run_elem("dicetv", [f], w, h, props="square-bits=3")[0]
        # scalar gold
        cs, mw, mh = 8, 4, 4
        s = 0
        dmap = []
        for _ in range(mw * mh):
            s = (s * 1103515245 + 12345) & 0xFFFFFFFF
            dmap.append((s >> 24) & 3)
        gold = f.copy()
        k = 0
        for my in range(mh):
            for mx in range(mw):
                blk = f[my * cs:(my + 1) * cs, mx * cs:(mx + 1) * cs]
                r = dmap[k]
                k += 1
                if r == 0:
                    nb = blk
                elif r == 1:    # LEFT: dest[dx, cs-1-dy] = src[dy, dx]
                    nb = np.rot90(blk, k=-1)
                elif r == 2:    # DOWN: 180
                    nb = np.rot90(blk, k=2)
                else:           # RIGHT
                    nb = np.rot90(blk, k=1)
                gold[my * cs:(my + 1) * cs, mx * cs:(mx + 1) * cs] = nb
        assert np.array_equal(got, gold)

    def test_warptv_first_frame_gold(self):
        import math
        w, h = 32, 16
        rng = np.random.RandomState(6)
        f = rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
        got = _run_elem("warptv", [f], w, h)[0]
        # scalar transliteration at tval=0
        sintable = [int(math.sin(i * math.pi / 512) * 32767)
                    for i in range(1024)]
        sintable += sintable[:256]
        halfw, halfh = w >> 1, h >> 1
        m = math.sqrt(halfw * halfw + halfh * halfh)
        xw = int(math.sin(100 * math.pi / 128) * 30)
        yw = int(math.sin(0.0) * -35)
        cw = int(math.sin(-70 * math.pi / 64) * 50)
        xw += int(math.sin(-10 * math.pi / 512) * 40)
        yw += int(math.sin(30 * math.pi / 512) * 40)
        ctable = []
        c = 0
        for _x in range(512):
            i = (c >> 3) & 0x3FE
            ctable.append((sintable[i] * yw) >> 15)
            ctable.append((sintable[i + 256] * xw) >> 15)
            c += cw
        gold = np.zeros_like(f)
        for y in range(h - 1):
            for x in range(w):
                yy = y - halfh
                xx = x - halfw
                d = (int(math.sqrt(xx * xx + yy * yy) * 511.9999 / m)) << 1
                dx = min(max(ctable[d + 1] + x, 0), w - 2)
                dy = min(max(ctable[d] + y, 0), h - 2)
                gold[y, x] = f[dy, dx]
        assert np.array_equal(got, gold)


class TestRippleTV:
    def test_motion_mode_matches_scalar_gold(self):
        w, h = 16, 12
        rng = np.random.RandomState(9)
        frames = [rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
                  for _ in range(3)]
        got = _run_elem("rippletv", frames, w, h)
        gold = self._gold(frames, w, h)
        for k, (a, b) in enumerate(zip(got, gold)):
            assert np.array_equal(a, b), k

    def _gold(self, frames, vw, vh):
        point, impact, decay, loopnum = 16, 2, 8, 2
        mw, mh = vw // 2 + 1, vh // 2 + 1
        map1 = np.zeros((mh + 1) * mw, np.int64)
        map2 = np.zeros((mh + 1) * mw, np.int64)
        map3 = np.zeros((mh + 1) * mw, np.int64)
        vtable = np.zeros((mh + 1) * mw * 2, np.int64)
        sqr = np.zeros(256, np.int64)
        sqr[:128] = np.arange(128) ** 2
        for i in range(1, 129):
            sqr[256 - i] = -(i * i)
        bg = None
        outs = []
        for f in frames:
            src = f.reshape(-1)
            lum = (((src & 0xFF0000) >> 15) + ((src & 0xFF00) >> 6)
                   + (src & 0xFF))
            if bg is None:
                bg = lum.copy()
            v = lum - bg
            bg = lum.copy()
            diff = (((v + 490) >> 24) | ((490 - v) >> 24)) & 0xFF
            # motiondetect pointer walk
            pi = mw + 1
            di = vw + 2
            for y in range(mh - 2, 0, -1):
                for x in range(mw - 2, 0, -1):
                    hh = (int(diff[di]) + int(diff[di + 1])
                          + int(diff[di + vw]) + int(diff[di + vw + 1]))
                    if hh > 0:
                        map1[pi] = hh << (point + impact - 8)
                        map2[pi] = map1[pi]
                    pi += 1
                    di += 2
                di += vw + 2
                pi += 2
            for _ in range(loopnum):
                p, q, r = mw + 1, mw + 1, mw + 1
                for y in range(mh - 2, 0, -1):
                    for x in range(mw - 2, 0, -1):
                        hh = (map1[p - mw - 1] + map1[p - mw + 1]
                              + map1[p + mw - 1] + map1[p + mw + 1]
                              + map1[p - mw] + map1[p - 1] + map1[p + 1]
                              + map1[p + mw] - map1[p] * 9) >> 3
                        vv = map1[p] - map2[q]
                        vv += hh - (vv >> decay)
                        map3[r] = vv + map1[p]
                        p += 1; q += 1; r += 1
                    p += 2; q += 2; r += 2
                p, q = mw + 1, mw + 1
                for y in range(mh - 2, 0, -1):
                    for x in range(mw - 2, 0, -1):
                        hh = (map3[p - mw] + map3[p - 1] + map3[p + 1]
                              + map3[p + mw] + map3[p] * 60)
                        map2[q] = hh >> 6
                        p += 1; q += 1
                    p += 2; q += 2
                map1, map2 = map2, map1
            # vectors
            vp = 0
            p = 0
            for y in range(mh - 1, 0, -1):
                for x in range(mw - 1, 0, -1):
                    vtable[vp] = sqr[((map1[p] - map1[p + 1]) >> (point - 1))
                                     & 0xFF]
                    vtable[vp + 1] = sqr[((map1[p] - map1[p + mw])
                                          >> (point - 1)) & 0xFF]
                    p += 1
                    vp += 2
                p += 1
                vp += 2
            dest = np.zeros(vw * vh, np.int64)
            vp = 0
            dp = 0
            for y in range(0, vh, 2):
                for x in range(0, vw, 2):
                    hh = int(vtable[vp])
                    vv = int(vtable[vp + 1])
                    dx = min(max(x + hh, 0), vw - 2)
                    dy = min(max(y + vv, 0), vh - 2)
                    dest[dp] = src[dy * vw + dx]
                    o_dx = dx
                    dx = x + 1 + int((hh + int(vtable[vp + 2])) / 2)
                    dx = min(max(dx, 0), vw - 2)
                    dest[dp + 1] = src[dy * vw + dx]
                    dy = y + 1 + int((vv + int(vtable[vp + mw * 2 + 1])) / 2)
                    dy = min(max(dy, 0), vh - 2)
                    dest[dp + vw] = src[dy * vw + o_dx]
                    dest[dp + vw + 1] = src[dy * vw + dx]
                    dp += 2
                    vp += 2
                dp += vw
                vp += 2     # gstripple.c:442 row-end vtable advance
            outs.append(dest.reshape(vh, vw) & 0xFFFFFFFF)
        return outs


class TestAgingTV:
    def test_matches_scalar_gold(self):
        w, h = 32, 24          # area_scale = 1 -> no dusts
        rng = np.random.RandomState(11)
        frames = [rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
                  for _ in range(4)]
        got = _run_elem("agingtv", frames, w, h)
        gold = self._gold(frames, w, h)
        for k, (a, b) in enumerate(zip(got, gold)):
            assert np.array_equal(a & 0xFFFFFF, b & 0xFFFFFF), k

    def _gold(self, frames, w, h):
        state = [0]

        def fr():
            state[0] = (state[0] * 1103515245 + 12345) & 0xFFFFFFFF
            return state[0]

        def signed(v):
            return v - (1 << 32) if v >= (1 << 31) else v

        area_scale = max(w * h // 64 // 480, 1)
        coloraging_state = [0]
        scratches = [dict(life=0, x=0, dx=0, init=0) for _ in range(20)]
        pits_interval = [0]
        outs = []
        for f in frames:
            src = f.reshape(-1)
            dest = np.zeros(w * h, np.int64)
            # coloraging
            c = coloraging_state[0]
            c -= signed(fr()) >> 28
            c = min(max(c, 0), 0x18)
            for i in range(w * h):
                a = int(src[i])
                b = (a & 0xFCFCFC) >> 2
                dest[i] = (a - b + (c | (c << 8) | (c << 16))
                           + ((fr() >> 8) & 0x101010)) & 0xFFFFFFFF
            coloraging_state[0] = c
            # scratching
            for s in scratches[:7]:
                if s["life"]:
                    s["x"] += s["dx"]
                    if s["x"] < 0 or s["x"] > w * 256:
                        s["life"] = 0
                        break
                    p = s["x"] >> 8
                    y1 = s["init"] or 0
                    s["init"] = 0
                    s["life"] -= 1
                    y2 = h if s["life"] else fr() % h
                    for y in range(y1, y2):
                        a = int(dest[y * w + p]) & 0xFEFEFF
                        a += 0x202020
                        b = a & 0x1010100
                        dest[y * w + p] = a | (b - (b >> 8))
                else:
                    if (fr() & 0xF0000000) == 0:
                        s["life"] = 2 + (fr() >> 27)
                        s["x"] = fr() % (w * 256)
                        s["dx"] = signed(fr()) >> 23
                        s["init"] = (fr() % (h - 1)) + 1
            # pits
            pnumscale = area_scale * 2
            if pits_interval[0]:
                pnum = pnumscale + (fr() % pnumscale)
                pits_interval[0] -= 1
            else:
                pnum = fr() % pnumscale
                if (fr() & 0xF8000000) == 0:
                    pits_interval[0] = (fr() >> 28) + 20
            for _i in range(pnum):
                x = fr() % (w - 1)
                y = fr() % (h - 1)
                size = fr() >> 28
                for _j in range(size):
                    x = (x + fr() % 3 - 1) & 0xFFFFFFFF
                    y = (y + fr() % 3 - 1) & 0xFFFFFFFF
                    if y >= h or x >= w:
                        break
                    dest[y * w + x] = 0xC0C0C0
            outs.append(dest.reshape(h, w))
        return outs


class TestOpTV:
    def test_spiral1_matches_scalar_gold(self):
        w, h = 32, 24
        rng = np.random.RandomState(12)
        f = rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
        got = _run_elem("optv", [f], w, h)[0]
        pal = np.zeros(256, np.int64)
        pal[128:240] = 0xFFFFFF
        for i in range(16):
            v = 16 * (i + 1) - 1
            pal[i + 112] = (v << 16) | (v << 8) | v
            v2 = 255 - v
            pal[i + 240] = (v2 << 16) | (v2 << 8) | v2
        gold = np.zeros((h, w), np.int64)
        for y in range(h):
            yy = (y - h // 2) / w
            for x in range(w):
                xx = x / w - 0.5
                r = math.sqrt(xx * xx + yy * yy)
                at = math.atan2(xx, yy)
                mp = int(at / math.pi * 256 + r * 4000) & 255
                m8 = mp - 256 if mp >= 128 else mp
                src = int(f[y, x])
                lum = (((src & 0xFF0000) >> 15) + ((src & 0xFF00) >> 6)
                       + (src & 0xFF))
                diff = ((60 * 7 - lum) >> 24) & 0xFF
                gold[y, x] = pal[(((m8 - 16) & 0xFF) ^ diff) & 255]
        assert np.array_equal(got & 0xFFFFFF, gold & 0xFFFFFF)


class TestRadioacTV:
    def test_mode0_matches_scalar_gold(self):
        w, h = 64, 48
        rng = np.random.RandomState(13)
        frames = [rng.randint(0, 1 << 24, (h, w)).astype(np.int64)
                  for _ in range(3)]
        got = _run_elem("radioactv", frames, w, h)
        gold = self._gold(frames, w, h)
        for k, (a, b) in enumerate(zip(got, gold)):
            assert np.array_equal(a & 0xFFFFFF, b & 0xFFFFFF), k

    def _gold(self, frames, w, h):
        COLORS, RATIO, TH = 32, 0.95, 40
        delta = 255 // (COLORS // 2 - 1)
        pal = np.zeros(COLORS * 4, np.int64)
        for i in range(COLORS // 2):
            pal[i] = i * delta
            pal[COLORS + i] = (i * delta) << 8
            pal[2 * COLORS + i] = (i * delta) << 16
            pal[i + COLORS // 2] = 255 | ((i * delta) << 16) \
                | ((i * delta) << 8)
            pal[COLORS + i + COLORS // 2] = (255 << 8) \
                | ((i * delta) << 16) | (i * delta)
            pal[2 * COLORS + i + COLORS // 2] = (255 << 16) \
                | ((i * delta) << 8) | (i * delta)
        for i in range(COLORS):
            pal[3 * COLORS + i] = (255 * i // COLORS) * 0x10101
        pal &= 0xFEFEFF
        palette = pal[3 * COLORS:4 * COLORS]   # white (swap_tab[3]=3)

        bwb = min(w // 32, 255)
        bw = bwb * 32
        bh = h
        area = bw * bh
        ml = (w - bw) // 2
        buf = np.zeros(2 * area + 2 * w, np.int64)
        bg = np.zeros(w * h, np.int64)
        # zoom tables
        hw, hh = bw // 2, bh // 2
        zx = []
        prev = int(0.5 + RATIO * (-hw) + hw)
        for xx_ in range(bwb):
            bits = 0
            for x in range(32):
                ptr = int(0.5 + RATIO * (xx_ * 32 + x - hw) + hw)
                bits >>= 1
                if ptr != prev:
                    bits |= 0x80000000
                prev = ptr
            zx.append(bits)
        zy = [0] * bh
        ty = int(0.5 + RATIO * (-hh) + hh)
        tx = int(0.5 + RATIO * (-hw) + hw)
        xx_ = int(0.5 + RATIO * (bw - 1 - hw) + hw)
        zy[0] = ty * bw + tx
        prevptr = ty * bw + xx_
        for y in range(1, bh):
            ty = int(0.5 + RATIO * (y - hh) + hh)
            zy[y] = ty * bw + tx - prevptr
            prevptr = ty * bw + xx_

        outs = []
        for f in frames:
            src = f.reshape(-1)
            lum = (((src & 0xFF0000) >> 15) + ((src & 0xFF00) >> 6)
                   + (src & 0xFF))
            v = lum - bg
            bg = lum.copy()
            th = TH * 7
            diff = (((v + th) >> 24) | ((th - v) >> 24)) & 0xFF
            # accumulate into buf
            d = diff.reshape(h, w)[:, ml:ml + bw].reshape(-1)
            buf[:area] |= d >> 3
            # blur (frame-width offset quirk)
            p = w + 1
            q = p + area
            for y in range(bh - 2, 0, -1):
                for x in range(bw - 2, 0, -1):
                    vv = ((buf[p - bw] + buf[p - 1] + buf[p + 1]
                           + buf[p + bw]) // 4 - 1) & 0xFF
                    if vv == 255:
                        vv = 0
                    buf[q] = vv
                    p += 1
                    q += 1
                p += 2
                q += 2
            # zoom
            p = area
            qq = 0
            for y in range(bh):
                p += zy[y]
                for b_ in range(bwb):
                    dx = zx[b_]
                    for x in range(32):
                        p += dx & 1
                        buf[qq] = buf[p]
                        qq += 1
                        dx >>= 1
            # palette add
            dest = src.copy()
            bi = 0
            si = 0
            for y in range(h):
                si += ml
                for x in range(bw):
                    a = int(src[si]) & 0xFEFEFF
                    a += int(palette[buf[bi] & 31])
                    b2 = a & 0x1010100
                    dest[si] = a | (b2 - (b2 >> 8))
                    si += 1
                    bi += 1
                si += max(h - bw - ml, 0)
            outs.append(dest.reshape(h, w))
        return outs
