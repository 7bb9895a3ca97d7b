"""SBR gold-state prober: dump the system libavcodec decoder's
derived SBR tables and per-envelope gain arrays from process memory.

The clean-room SBR decoder (gstreamer_tpu/codecs/sbr.py) needs a
conformance oracle for more than PCM output: the spec's derived
frequency tables (master/low/high/noise/limiter), patch map, and the
per-subband envelope-adjustment arrays (e_origmapped, q_mapped,
e_curr, gain, q_m, s_m) are all intermediate state.  The system
libavcodec has no API to expose them, so this module decodes a
crafted HE-AAC stream in a subprocess via the ctypes wrapper
(gstreamer_tpu/native/av.py) and then reads the decoder's
SpectralBandReplication struct straight out of /proc/self/mem.

Anchoring: the struct is located by scanning writable anonymous
memory for the f_master int16 signature (verified against
sample_rate and table monotonicity); intra-struct offsets were
recovered from disassembly of the system libavcodec 59 and are
cross-checked structurally (f_master[49] / f_tablelow[25] /
f_tablehigh[49] / f_tablenoise[6] / f_tablelim[30] spacing).  All
array reads are sanity-checked; a failed check returns None rather
than garbage.

This is test-support tooling (like tests/gst_ref.py): the product
decoder never does any of this.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from typing import List, Optional

# ---- struct offsets (system libavcodec.so.59, float decoder) ----
OFF_SAMPLE_RATE = 0x0
OFF_K = 0x34                    # unsigned k[5]
OFF_KX = 0x48                   # unsigned kx[2]
OFF_M = 0x50                    # unsigned m[2]
OFF_N_MASTER = 0x5C
OFF_N = 0x4BB80                 # unsigned n[2]
OFF_N_Q = 0x4BB88
OFF_N_LIM = 0x4BB8C
OFF_F_MASTER = 0x4BB90          # int16[49]
OFF_F_LOW = 0x4BBF2             # int16[25]
OFF_F_HIGH = 0x4BC24            # int16[49]
OFF_F_NOISE = 0x4BC86           # int16[6]
OFF_F_LIM = 0x4BC92             # int16[30]
OFF_NUM_PATCHES = 0x4BCD0
OFF_PATCH_NUM = 0x4BCD4         # uint8[6]
OFF_PATCH_START = 0x4BCDA       # uint8[6]
OFF_X_LOW = 0x4BCE0             # float[32][40][2]
OFF_X_HIGH = OFF_X_LOW + 32 * 40 * 2 * 4
OFF_X = OFF_X_HIGH + 64 * 40 * 2 * 4
OFF_ALPHA0 = OFF_X + 2 * 2 * 38 * 64 * 4
OFF_ALPHA1 = OFF_ALPHA0 + 64 * 2 * 4
OFF_E_ORIGMAPPED = OFF_ALPHA1 + 64 * 2 * 4      # float[7][48]
OFF_Q_MAPPED = OFF_E_ORIGMAPPED + 7 * 48 * 4
OFF_S_MAPPED = OFF_Q_MAPPED + 7 * 48 * 4        # uint8[7][48]
OFF_E_CURR = OFF_S_MAPPED + 7 * 48
OFF_Q_M = OFF_E_CURR + 7 * 48 * 4
OFF_S_M = OFF_Q_M + 7 * 48 * 4
OFF_GAIN = OFF_S_M + 7 * 48 * 4


def _probe_main() -> None:
    """Subprocess entry: read ADTS from argv[1], decode ~n frames,
    scan for the SBR struct, print JSON to stdout."""
    import ctypes
    import struct as _struct

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gstreamer_tpu.codecs.aac import parse_adts_header
    from gstreamer_tpu.native import av

    with open(sys.argv[1], "rb") as f:
        he = f.read()
    out_rate = int(sys.argv[2])
    f_master_sig = json.loads(sys.argv[3]) if len(sys.argv) > 3 else None

    lib = av.get_lib()
    if lib is None:
        print(json.dumps(None))
        return
    h = lib.gtpu_avdec_new(b"aac", b"", 0, 0, 0)
    buf = np.zeros(1 << 20, np.float32)
    pos = 0
    n = 0
    pcm_parts = []
    r_rate = ctypes.c_int()
    r_ch = ctypes.c_int()
    while pos + 7 <= len(he) and n < 64:
        ah = parse_adts_header(he, pos)
        if ah is None:
            break
        flen = ah[0]
        lib.gtpu_avdec_send(h, he[pos:pos + flen], flen)
        while True:
            r = lib.gtpu_avdec_recv_audio(
                h, buf.ctypes.data_as(ctypes.c_void_p), buf.size,
                ctypes.byref(r_rate), ctypes.byref(r_ch))
            if r <= 0:
                break
            ch = max(r_ch.value, 1)
            pcm_parts.append(buf[:r * ch].reshape(r, ch).copy())
        pos += flen
        n += 1

    # ---- locate the struct ----
    memf = open("/proc/self/mem", "rb", 0)

    def rd(addr: int, nb: int) -> bytes:
        memf.seek(addr)
        return memf.read(nb)

    hits = []
    if f_master_sig:
        sig = np.asarray(f_master_sig, np.int16).tobytes()
        for line in open("/proc/self/maps"):
            parts = line.split()
            if "r" not in parts[1] or "w" not in parts[1]:
                continue
            lo, hi = (int(x, 16) for x in parts[0].split("-"))
            if hi - lo > (1 << 30):
                continue
            try:
                data = rd(lo, hi - lo)
            except (OSError, ValueError):
                continue
            off = data.find(sig)
            while off != -1:
                hits.append(lo + off - OFF_F_MASTER)
                off = data.find(sig, off + 1)

    result = None
    for base in hits:
        def u32(off):
            return _struct.unpack("<I", rd(base + off, 4))[0]

        def i16s(off, cnt):
            return list(_struct.unpack(f"<{cnt}h", rd(base + off,
                                                      2 * cnt)))

        def f32s(off, cnt):
            a = np.frombuffer(rd(base + off, 4 * cnt), np.float32)
            return a.astype(float).tolist()

        try:
            if u32(OFF_SAMPLE_RATE) != out_rate:
                continue
            n_master = u32(OFF_N_MASTER)
            if not (1 <= n_master <= 48):
                continue
            fm = i16s(OFF_F_MASTER, n_master + 1)
            if any(b <= a for a, b in zip(fm, fm[1:])):
                continue
            n_low, n_high = u32(OFF_N), u32(OFF_N + 4)
            n_q, n_lim = u32(OFF_N_Q), u32(OFF_N_LIM)
            if not (1 <= n_high <= 48 and 1 <= n_low <= 24
                    and 1 <= n_q <= 5 and 1 <= n_lim <= 29):
                continue
            M = u32(OFF_M + 4)
            npat = u32(OFF_NUM_PATCHES)
            if not (0 <= npat <= 6 and 1 <= M <= 48):
                continue
            eo = np.array(f32s(OFF_E_ORIGMAPPED, 7 * 48)).reshape(7, 48)
            if not np.all(np.isfinite(eo)):
                continue
            result = {
                "sample_rate": u32(OFF_SAMPLE_RATE),
                "k": [u32(OFF_K + 4 * i) for i in range(3)],
                "kx": [u32(OFF_KX), u32(OFF_KX + 4)],
                "M": [u32(OFF_M), M],
                "n_master": n_master,
                "f_master": fm,
                "f_low": i16s(OFF_F_LOW, n_low + 1),
                "f_high": i16s(OFF_F_HIGH, n_high + 1),
                "f_noise": i16s(OFF_F_NOISE, n_q + 1),
                "f_lim": i16s(OFF_F_LIM, n_lim + 1),
                "num_patches": npat,
                "patch_num": list(rd(base + OFF_PATCH_NUM, 6)),
                "patch_start": list(rd(base + OFF_PATCH_START, 6)),
                "e_origmapped": eo[:, :M].tolist(),
                "q_mapped": np.array(f32s(OFF_Q_MAPPED, 7 * 48))
                .reshape(7, 48)[:, :M].tolist(),
                "s_mapped": np.frombuffer(
                    rd(base + OFF_S_MAPPED, 7 * 48),
                    np.uint8).reshape(7, 48)[:, :M].tolist(),
                "e_curr": np.array(f32s(OFF_E_CURR, 7 * 48))
                .reshape(7, 48)[:, :M].tolist(),
                "q_m": np.array(f32s(OFF_Q_M, 7 * 48))
                .reshape(7, 48)[:, :M].tolist(),
                "s_m": np.array(f32s(OFF_S_M, 7 * 48))
                .reshape(7, 48)[:, :M].tolist(),
                "gain": np.array(f32s(OFF_GAIN, 7 * 48))
                .reshape(7, 48)[:, :M].tolist(),
            }
            break
        except (OSError, ValueError, _struct.error):
            continue

    if pcm_parts:
        pcm = np.concatenate(pcm_parts)
        meta = {"rate": r_rate.value, "ch": pcm.shape[1],
                "n_samples": int(pcm.shape[0])}
    else:
        meta = {"rate": 0, "ch": 0, "n_samples": 0}
    print(json.dumps({"state": result, "pcm": meta}))


def dump_sbr_state(he_adts: bytes, out_rate: int,
                   f_master: List[int],
                   timeout: float = 300.0) -> Optional[dict]:
    """Decode `he_adts` with the system decoder in a subprocess and
    return its SBR struct contents (see _probe_main), or None if the
    oracle is unavailable or the struct could not be located.
    `f_master` is the expected master table used as the memory-scan
    anchor (it is independently verified by the structural checks)."""
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".adts",
                                     delete=False) as f:
        f.write(he_adts)
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), path,
             str(out_rate), json.dumps(f_master)],
            capture_output=True, text=True, timeout=timeout)
        if r.returncode != 0 or not r.stdout.strip():
            return None
        out = json.loads(r.stdout.strip().splitlines()[-1])
        return out.get("state") if isinstance(out, dict) else None
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        return None
    finally:
        os.unlink(path)


if __name__ == "__main__":
    _probe_main()
