"""Piecewise timing of the headline pipeline stages on the real TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gstreamer_tpu.video.converter import VideoConverter
from gstreamer_tpu.video.info import VideoInfo
from gstreamer_tpu.video import scaler as scaler_mod
from gstreamer_tpu.video import chroma as chroma_mod
from gstreamer_tpu.video import color as color_mod

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B = 256
ii = VideoInfo(format="I420", width=1920, height=1080)
oi = VideoInfo(format="RGB", width=224, height=224)
conv = VideoConverter(ii, oi, {"resampler-method": "linear",
                               "resampler-taps": 2})
plan = conv._plan

rng = np.random.default_rng(0)
planes = tuple(
    jnp.asarray(rng.integers(0, 256, (B,) + s, dtype=np.uint8))
    for s in ii.plane_shapes())


def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn)
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms/batch  {B/dt:9.0f} fps")
    return out


# 1. full pipeline
timeit("FULL pipeline", conv.trace_fn(), planes)

# 2. Y path only: unpack int16 + hscale + vscale
h_res, v_res = plan["h_res"], plan["v_res"]

def y_only(ps):
    y = ps[0].astype(jnp.int16)
    y = scaler_mod.scale_axis_exact(jnp, y, -1, h_res, value_bits=8)
    y = scaler_mod.scale_axis_exact(jnp, y, -2, v_res, value_bits=8)
    return y

timeit("Y h+v scale", y_only, planes)

# 2b. Y fused hv (transposed intermediate)
def y_hv(ps):
    y = ps[0].astype(jnp.int16)
    return scaler_mod.scale_hv_exact(jnp, y, h_res, v_res)

timeit("Y fused hv", y_hv, planes)

# 3. chroma path (both planes) as in _pipeline_phase_split
def chroma_only(ps):
    outs = []
    for c in (ps[1], ps[2]):
        c = c.astype(jnp.int16)
        ce, co = chroma_mod.up2_phases(jnp, c, -1, plan["up_h_cosited"])
        ce_re, ce_ro = chroma_mod.up2_phases(jnp, ce, -2, plan["up_v_cosited"])
        co_re, co_ro = chroma_mod.up2_phases(jnp, co, -2, plan["up_v_cosited"])
        h_re = scaler_mod.scale_cols_split_exact(jnp, ce_re, co_re, h_res)
        h_ro = scaler_mod.scale_cols_split_exact(jnp, ce_ro, co_ro, h_res)
        outs.append(scaler_mod.scale_rows_split_exact(jnp, h_re, h_ro, v_res))
    return tuple(outs)

timeit("chroma phase-split (U+V)", chroma_only, planes)

# 3b. chroma via fused hv-split
def chroma_hv(ps):
    outs = []
    for c in (ps[1], ps[2]):
        c = c.astype(jnp.int16)
        ce, co = chroma_mod.up2_phases(jnp, c, -1, plan["up_h_cosited"])
        ce_re, ce_ro = chroma_mod.up2_phases(jnp, ce, -2, plan["up_v_cosited"])
        co_re, co_ro = chroma_mod.up2_phases(jnp, co, -2, plan["up_v_cosited"])
        outs.append(scaler_mod.scale_hv_split_exact(
            jnp, ce_re, co_re, h_res, v_res,
            row_even=ce_ro, row_odd=co_ro))
    return tuple(outs)

timeit("chroma fused hv-split (U+V)", chroma_hv, planes)

# 4. matrix+pack on 224x224 (tiny)
y224 = jnp.zeros((B, 224, 224), jnp.int32)
def mat_pack(y, u, v):
    chans = (None, y, u, v)
    chans = color_mod.apply_prepared_planes(jnp, chans, plan["matrix"])
    from gstreamer_tpu.video.format import pack_planes
    return pack_planes(jnp, oi.finfo, chans, oi.width, oi.height)

timeit("matrix+pack 224x224", mat_pack, y224, y224, y224)

# 5. raw HBM read bound: sum all planes
def rd(ps):
    return sum(p.astype(jnp.float32).sum() for p in ps)
timeit("HBM read all planes (sum)", rd, planes)
