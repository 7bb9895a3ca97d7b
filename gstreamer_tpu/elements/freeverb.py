"""freeverb — the classic public-domain Schroeder/Moorer reverb.

Port of gst-plugins-bad/gst/freeverb/gstfreeverb.c (Jezar's Freeverb):
* 8 parallel damped combs + 4 series allpasses per channel, the
  canonical 44.1kHz tunings scaled by rate/44100 with C float->int
  truncation (gst_freeverb_init_rev_model :484-530);
* comb: filterstore = tmp*damp2 + filterstore*damp1;
  buf[idx] = in + filterstore*feedback (:277-286);
  allpass: out = bufout - in; buf[idx] = in + bufout*0.5 (:188-199);
* DC_OFFSET 1e-8 anti-denormal trick, roomsize/damping/width/level
  parameter mapping (:543-568), stereo crossmix wet1/wet2;
* mono input duplicates into the stereo engine via
  input = (2*in + DC)*gain (:708); output is always stereo.

The per-sample recursion runs as one jitted lax.scan carrying the ring
buffers in device state — float32 ops in the reference's order (XLA
may contract mul+add into FMA, so parity vs the scalar gold is
asserted to float32 tolerance, not bit-exact).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..audio.info import AudioInfo
from ..core.buffer import Buffer
from ..core.caps import Caps
from ..core.element import (PadDirection, PadTemplate, TransformElement,
                            register_element)

COMB_TUNINGS = [1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617]
ALLPASS_TUNINGS = [556, 441, 341, 225]
STEREO_SPREAD = 23
FIXED_GAIN = np.float32(0.015)
SCALE_ROOM = np.float32(0.28)
OFFSET_ROOM = np.float32(0.7)
DC_OFFSET = np.float32(1e-8)

_SINK = ("audio/x-raw, format={ F32LE, S16LE }, rate=[1,2147483647], "
         "channels=[1,2], layout=interleaved")
_SRC = ("audio/x-raw, format={ F32LE, S16LE }, rate=[1,2147483647], "
        "channels=2, layout=interleaved")


@register_element
class Freeverb(TransformElement):
    FACTORY = "freeverb"
    DESCRIPTION = "Add reverberation to audio streams"
    HOST_ELEMENT = True
    PAD_TEMPLATES = [
        PadTemplate("sink", PadDirection.SINK, _SINK),
        PadTemplate("src", PadDirection.SRC, _SRC),
    ]
    PROPERTIES = {
        "room-size": (float, 0.5, "size of the simulated room"),
        "damping": (float, 0.2, "damping of high frequencies"),
        "width": (float, 1.0, "stereo panorama width"),
        "level": (float, 0.5, "dry/wet level"),
    }

    def __init__(self, name=None, **props):
        super().__init__(name=name, **props)
        self._state = None
        self._fn_cache = {}

    def start(self):
        self._state = None
        self._fn_cache = {}

    def transform_caps(self, direction, caps, filter=None):
        out = []
        for s in caps:
            tmpl = _SRC if direction == PadDirection.SINK else _SINK
            ns = Caps.from_string(tmpl)[0].copy()
            for key in ("format", "rate"):
                if key in s.fields:
                    ns[key] = s[key]
            out.append(ns)
        res = Caps(out).simplify()
        if filter is not None:
            res = res.intersect(filter)
        return res

    def set_info(self, incaps, outcaps):
        self._info = AudioInfo.from_caps_structure(incaps[0])
        self._state = None
        self._fn_cache = {}

    # -- engine ------------------------------------------------------------
    def _sizes(self):
        srf = np.float32(self._info.rate) / np.float32(44100.0)
        combs = [(int(np.float32(t) * srf), int(np.float32(
            t + STEREO_SPREAD) * srf)) for t in COMB_TUNINGS]
        aps = [(int(np.float32(t) * srf), int(np.float32(
            t + STEREO_SPREAD) * srf)) for t in ALLPASS_TUNINGS]
        return ([max(l, 1) for l, _ in combs],
                [max(r, 1) for _, r in combs],
                [max(l, 1) for l, _ in aps],
                [max(r, 1) for _, r in aps])

    def _fresh_state(self):
        import jax.numpy as jnp
        cl, cr, al, ar = self._sizes()

        def bufs(sizes):
            return ([jnp.full(n, DC_OFFSET, jnp.float32)
                     for n in sizes],
                    [jnp.zeros((), jnp.int32) for _ in sizes])

        combL_b, combL_i = bufs(cl)
        combR_b, combR_i = bufs(cr)
        apL_b, apL_i = bufs(al)
        apR_b, apR_i = bufs(ar)
        fsL = [jnp.zeros((), jnp.float32) for _ in cl]
        fsR = [jnp.zeros((), jnp.float32) for _ in cr]
        return dict(combL=(combL_b, combL_i, fsL),
                    combR=(combR_b, combR_i, fsR),
                    apL=(apL_b, apL_i), apR=(apR_b, apR_i))

    def _params(self):
        rs = np.float32(self.props["room-size"])
        feedback = rs * SCALE_ROOM + OFFSET_ROOM
        damp1 = np.float32(self.props["damping"])    # scaledamp = 1
        damp2 = np.float32(1.0) - damp1
        wet = np.float32(self.props["level"])        # scalewet = 1
        width = np.float32(self.props["width"])
        wet1 = wet * (width / np.float32(2.0) + np.float32(0.5))
        wet2 = wet * ((np.float32(1.0) - width) / np.float32(2.0))
        dry = (np.float32(1.0) - np.float32(self.props["level"]))
        return feedback, damp1, damp2, wet1, wet2, dry

    def _process_fn(self, n, stereo_in):
        key = (n, stereo_in)
        if key in self._fn_cache:
            return self._fn_cache[key]
        import jax
        import jax.numpy as jnp
        from jax import lax

        feedback, damp1, damp2, wet1, wet2, dry = self._params()
        gain = FIXED_GAIN

        def comb_step(bufs, idxs, fss, x):
            outs = jnp.float32(0.0)
            nb, ni, nf = [], [], []
            for buf, idx, fs in zip(bufs, idxs, fss):
                tmp = buf[idx]
                fs = tmp * damp2 + fs * damp1
                buf = buf.at[idx].set(x + fs * feedback)
                idx = jnp.where(idx + 1 >= buf.shape[0], 0, idx + 1)
                outs = outs + tmp
                nb.append(buf)
                ni.append(idx)
                nf.append(fs)
            return nb, ni, nf, outs

        def allpass_chain(bufs, idxs, x):
            nb, ni = [], []
            for buf, idx in zip(bufs, idxs):
                bufout = buf[idx]
                out = bufout - x
                buf = buf.at[idx].set(x + bufout * jnp.float32(0.5))
                idx = jnp.where(idx + 1 >= buf.shape[0], 0, idx + 1)
                x = out
                nb.append(buf)
                ni.append(idx)
            return nb, ni, x

        def step(state, xin):
            if stereo_in:
                in2l, in2r = xin[0], xin[1]
                in1l = (in2l + DC_OFFSET) * gain
                in1r = (in2r + DC_OFFSET) * gain
            else:
                in2l = in2r = xin[0]
                in1l = in1r = (jnp.float32(2.0) * xin[0]
                               + DC_OFFSET) * gain
            cb, ci, cf = state["combL"]
            cb, ci, cf, out_l = comb_step(cb, ci, cf, in1l)
            state = dict(state, combL=(cb, ci, cf))
            cb, ci, cf = state["combR"]
            cb, ci, cf, out_r = comb_step(cb, ci, cf, in1r)
            state = dict(state, combR=(cb, ci, cf))
            ab, ai = state["apL"]
            ab, ai, out_l = allpass_chain(ab, ai, out_l)
            state = dict(state, apL=(ab, ai))
            ab, ai = state["apR"]
            ab, ai, out_r = allpass_chain(ab, ai, out_r)
            state = dict(state, apR=(ab, ai))
            out_l = out_l - DC_OFFSET
            out_r = out_r - DC_OFFSET
            ol = out_l * wet1 + out_r * wet2 + in2l * dry
            orr = out_r * wet1 + out_l * wet2 + in2r * dry
            return state, jnp.stack([ol, orr])

        fn = jax.jit(lambda st, xs: lax.scan(step, st, xs))
        self._fn_cache[key] = fn
        return fn

    def host_process(self, buf: Buffer) -> Optional[Buffer]:
        import jax.numpy as jnp

        x = np.asarray(buf.data)
        if x.ndim == 1:
            x = x[:, None]
        is_s16 = x.dtype == np.int16
        xf = x.astype(np.float32)
        if self._state is None:
            self._state = self._fresh_state()
        fn = self._process_fn(len(xf), x.shape[1] == 2)
        self._state, out = fn(self._state, jnp.asarray(xf))
        out = np.asarray(out)
        if is_s16:
            out = np.clip(out, -32768, 32767).astype(np.int16)
        return buf.with_(data=out)
