"""Clean-room SBR (HE-AAC v1) decoder conformance.

Three oracle tiers (reference uses faad2/libav as gold the same way,
gst-plugins-bad/ext/faad/gstfaad.c:1):
  1. pure-math properties (QMF selectivity / near-perfect
     reconstruction) — always run;
  2. recorded gold state: derived frequency tables captured once
     from the system decoder's memory (tests/sbr_oracle.py) — always
     run;
  3. live oracle: PCM band-spectrum parity and in-memory gain-array
     parity vs the system libavcodec HE-AAC decoder — skipped when
     the system oracle is unavailable.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import aac_oracle as ao  # noqa: E402
from sbr_writer import splice_sbr_adts  # noqa: E402

from gstreamer_tpu.codecs import sbr as S  # noqa: E402
from gstreamer_tpu.codecs.aac import (AACDecoder, Bits,  # noqa: E402
                                      parse_adts_header)

needs_aac = pytest.mark.skipif(not ao.have_aac(),
                               reason="system libavcodec missing")

RATE = 24000


def _core_adts(seed=7, seconds=2.0, stereo=False, bitrate=160000):
    rng = np.random.default_rng(seed)
    n = int(RATE * seconds)
    sig = 0.25 * rng.standard_normal((n, 2 if stereo else 1))
    pcm = np.round(np.clip(sig, -1, 1) * 32767).astype(np.int16)
    return ao.aac_encode_adts(pcm, RATE, bitrate, "aac_pns=0")


def _decode_mine(he):
    dec = None
    pos = 0
    outs = []
    while pos + 7 <= len(he):
        ah = parse_adts_header(he, pos)
        if ah is None:
            break
        if dec is None:
            dec = AACDecoder(ah[1], ah[2])
        outs.append(dec.decode_frame(Bits(he[pos + ah[4]:pos + ah[0]])))
        pos += ah[0]
    return np.concatenate(outs), dec


def _worst_band_db(mine, gold, fs=48000, lo=300, hi=23000):
    """Align, then compare 1/3-octave-ish band powers; returns the
    worst absolute dB difference over bands gold has energy in."""
    n = min(len(mine), len(gold))
    a, g = mine[:n], gold[:n]
    c = np.correlate(a[:fs], g[2000:int(0.8 * fs)], "valid")
    lag = int(np.argmax(np.abs(c))) - 2000
    a, g = (a[lag:], g) if lag >= 0 else (a, g[-lag:])
    m = min(len(a), len(g))
    a, g = a[6000:m - 6000], g[6000:m - 6000]
    F = 4096
    w = np.hanning(F)
    sa = np.mean([np.abs(np.fft.rfft(a[i:i + F] * w)) ** 2
                  for i in range(0, len(a) - F, F // 2)], axis=0)
    sg = np.mean([np.abs(np.fft.rfft(g[i:i + F] * w)) ** 2
                  for i in range(0, len(g) - F, F // 2)], axis=0)
    freqs = np.arange(len(sa)) * fs / F
    worst = 0.0
    ref = sg.max()
    edges = np.geomspace(lo, hi, 28)
    for b0, b1 in zip(edges[:-1], edges[1:]):
        sel = (freqs >= b0) & (freqs < b1)
        if not sel.any() or sg[sel].mean() < ref * 1e-7:
            continue
        worst = max(worst, abs(10 * np.log10(
            (sa[sel].mean() + 1e-12) / (sg[sel].mean() + 1e-12))))
    return worst


# ------------------------------------------------------ tier 1: math

def test_qmf_selectivity():
    """The 640-tap prototype rejects an adjacent-band-center tone by
    >40 dB (the sign-fold bug this guards against gave -9.5 dB)."""
    fs = 48000
    t = np.arange(fs) / fs
    sig = np.sin(2 * np.pi * 937.5 * t) * 16384
    X = S.QmfAnalysis(64).process(sig[:fs // 64 * 64])
    E = (np.abs(X[200:]) ** 2).mean(axis=0)
    assert np.argmax(E) == 2
    for k in (1, 3):
        assert 10 * np.log10(E[k] / E[2]) < -40
    for k in (0, 4, 5):
        assert 10 * np.log10(E[k] / E[2]) < -80


def test_qmf_near_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(64 * 200)
    y = S.QmfSynthesis(64).process(S.QmfAnalysis(64).process(x))
    c = np.correlate(y, x[:64 * 100], "valid")
    lag = int(np.argmax(np.abs(c)))
    err = y[lag:lag + 64 * 80] - x[:64 * 80]
    snr = 10 * np.log10((x[:64 * 80] ** 2).mean()
                        / max((err ** 2).mean(), 1e-300))
    assert snr > 55


# --------------------------------------- tier 2: recorded gold state

# captured from the system libavcodec decoder's SpectralBandReplication
# struct via tests/sbr_oracle.py (output rate 48000)
_RECORDED = [
    (dict(start_freq=5, stop_freq=3), dict(
        f_master=[13, 14, 15, 16, 17, 18, 19, 21, 23, 25, 27],
        f_low=[13, 15, 17, 19, 23, 27],
        f_noise=[13, 17, 27],
        f_lim=[13, 17, 23],
        patches=[(1, 12)])),
    (dict(start_freq=5, stop_freq=5), dict(
        patches=[(1, 11), (4, 8)])),
    (dict(start_freq=8, stop_freq=7, xover_band=2), dict(
        patches=[(4, 12), (8, 8)])),
    (dict(start_freq=4, stop_freq=6, freq_scale=3, noise_bands=3),
     dict(f_low=[12, 14, 16, 20, 24, 29, 35],
          f_lim=[12, 16, 22, 32, 35],
          patches=[(2, 10), (2, 10), (8, 3)])),
    (dict(start_freq=6, stop_freq=2, freq_scale=0, alter_scale=0),
     dict(patches=[(2, 11)])),
]


def test_freq_tables_recorded_gold():
    for cfg, want in _RECORDED:
        ft = S.make_freq_tables(S.SbrHeader(**cfg), 48000)
        for key, val in want.items():
            got = getattr(ft, "patches" if key == "patches" else key)
            assert list(map(list, got)) == list(map(list, val)) \
                if key == "patches" else got == val, (cfg, key)


def test_limiter_table_thins_top_border():
    """k2 itself is thinned from the limiter table when too close to
    the previous border; subbands above get zero gain (observed in
    the system decoder; the pre-fix code filled them with garbage)."""
    ft = S.make_freq_tables(S.SbrHeader(start_freq=5, stop_freq=3),
                            48000)
    assert ft.f_lim[-1] == 23 < ft.kx + ft.M


def test_patch_drop_rule():
    """A trailing patch shorter than 3 subbands is dropped."""
    ft = S.make_freq_tables(S.SbrHeader(start_freq=5, stop_freq=3),
                            48000)
    assert ft.patches == [(1, 12)]       # the (11, 2) tail is gone


# ------------------------------------------------ tier 3: live oracle

@needs_aac
def test_tables_vs_live_oracle():
    from sbr_oracle import dump_sbr_state
    adts = _core_adts(seconds=1.0)
    for cfg in (dict(start_freq=5, stop_freq=5),
                dict(start_freq=4, stop_freq=6, freq_scale=3,
                     noise_bands=3)):
        hdr = S.SbrHeader(amp_res=1, **cfg)
        ft = S.make_freq_tables(hdr, 48000)
        he = splice_sbr_adts(adts, hdr, env_q=[70], noise_q=[25],
                             invf_mode=0)
        st = dump_sbr_state(he, 48000, ft.f_master)
        if st is None:
            pytest.skip("oracle state probe unavailable")
        assert st["f_low"] == ft.f_low
        assert st["f_lim"] == ft.f_lim
        assert st["f_noise"] == ft.f_noise
        gold_patches = [(st["patch_start"][i], st["patch_num"][i])
                        for i in range(st["num_patches"])]
        assert gold_patches == ft.patches
        assert (st["kx"][1], st["M"][1]) == (ft.kx, ft.M)


@needs_aac
def test_gain_arrays_vs_live_oracle():
    """Feed stationary sines; my per-envelope gain vector must match
    the system decoder's in-memory one within 2%."""
    from sbr_oracle import dump_sbr_state
    t = np.arange(RATE * 2) / RATE
    sig = sum(0.15 * np.sin(2 * np.pi * f * t + i)
              for i, f in enumerate((937.5, 2062.5, 3187.5)))
    pcm = np.round(np.clip(sig, -1, 1) * 32767).astype(np.int16)
    adts = ao.aac_encode_adts(pcm[:, None], RATE, 160000,
                              "aac_pns=0")
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    he = splice_sbr_adts(adts, hdr, env_q=[80], noise_q=[30],
                         invf_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    st = dump_sbr_state(he, 48000, ft.f_master)
    if st is None:
        pytest.skip("oracle state probe unavailable")
    taps = []
    S._DEBUG_TAP = taps.append
    try:
        _decode_mine(he)
    finally:
        S._DEBUG_TAP = None
    mine = np.mean([t["gain"][0] for t in taps[-20:]], axis=0)
    gold = np.array(st["gain"][0])
    nz = gold > 0
    assert nz.any()
    assert np.allclose(mine[nz], gold[nz], rtol=0.02)
    # zero outside the limiter coverage on both sides
    assert np.allclose(mine[~nz], 0.0)
    eo = np.mean([t["e_orig"][0] for t in taps[-5:]], axis=0)
    assert np.allclose(eo, st["e_origmapped"][0], rtol=1e-6)


@needs_aac
@pytest.mark.parametrize("label,kw", [
    ("1env", dict(num_env=1, env_q=[80], noise_q=[30], invf_mode=0)),
    ("2env", dict(num_env=2, env_q=[[60], [70]], noise_q=[20, 26],
                  invf_mode=0)),
    ("4env", dict(num_env=4, env_q=[55, 60, 65, 70], noise_q=[22],
                  invf_mode=1)),
    ("lowres", dict(num_env=1, env_q=[66], noise_q=[24], freq_res=0,
                    invf_mode=0)),
    ("chirp", dict(num_env=1, env_q=[70], noise_q=[14],
                   invf_mode=3)),
    ("noisy", dict(num_env=1, env_q=[60], noise_q=[5],
                   invf_mode=2)),
    ("sine", dict(num_env=1, env_q=[65], noise_q=[20], invf_mode=0,
                  add_harmonic=[0, 1, 0, 0, 1])),
])
def test_e2e_spectrum_parity(label, kw):
    adts = _core_adts()
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    he = splice_sbr_adts(adts, hdr, **kw)
    g = ao.aac_decode_adts(he)
    assert g is not None
    gold, grate, _gch = g
    assert grate == 48000                # oracle honoured the SBR
    mine, dec = _decode_mine(he)
    assert dec.sbr_present
    assert dec.output_rate == 48000
    assert _worst_band_db(mine[:, 0], gold[:, 0].astype(float)) < 1.0


@needs_aac
def test_e2e_second_header_config():
    """Multi-patch tables + interpol_freq=0 + slot smoothing +
    -3 dB limiter gain."""
    adts = _core_adts()
    hdr = S.SbrHeader(amp_res=0, start_freq=8, stop_freq=7,
                      xover_band=2, interpol_freq=0,
                      smoothing_mode=0, limiter_gains=1)
    he = splice_sbr_adts(adts, hdr, num_env=2,
                         env_q=[[120], [130]], noise_q=[18, 24],
                         invf_mode=1)
    g = ao.aac_decode_adts(he)
    assert g is not None
    gold, grate, _ = g
    assert grate == 48000
    mine, _dec = _decode_mine(he)
    assert _worst_band_db(mine[:, 0], gold[:, 0].astype(float)) < 1.0


@needs_aac
@pytest.mark.parametrize("coupling", [False, True])
def test_e2e_cpe(coupling):
    adts = _core_adts(seed=11, stereo=True, bitrate=192000)
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    cpe = (dict(coupling=True, env_bal=[14], noise_bal=[11])
           if coupling else
           dict(coupling=False, env_q1=[64], noise_q1=[22]))
    he = splice_sbr_adts(adts, hdr, env_q=[68], noise_q=[24],
                         cpe=cpe)
    g = ao.aac_decode_adts(he)
    assert g is not None
    gold, grate, gch = g
    assert grate == 48000 and gch == 2
    mine, _dec = _decode_mine(he)
    for ch in range(2):
        assert _worst_band_db(mine[:, ch],
                              gold[:, ch].astype(float)) < 1.0


@needs_aac
def test_lowband_passthrough_snr():
    """Below the crossover the output is the (near-PR-delayed) core:
    >40 dB SNR vs the system decoder after integer alignment."""
    adts = _core_adts(seed=3)
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    he = splice_sbr_adts(adts, hdr, env_q=[80], noise_q=[30],
                         invf_mode=0)
    g = ao.aac_decode_adts(he)
    assert g is not None
    gold = g[0][:, 0].astype(float)
    mine, _dec = _decode_mine(he)
    a = mine[:, 0]
    n = min(len(a), len(gold))
    # lowpass both below the crossover (kx=13 -> 4875 Hz)
    F = np.fft.rfftfreq(n, 1 / 48000)
    mask = F < 4000
    A = np.fft.rfft(a[:n])
    G = np.fft.rfft(gold[:n])
    A[~mask] = 0
    G[~mask] = 0
    la, lg = np.fft.irfft(A, n), np.fft.irfft(G, n)
    best = -1e9
    skip = 8000                          # decoder warm-up transients
    for lag in range(200, 360):
        e = la[skip + lag:skip + lag + 48000] - lg[skip:skip + 48000]
        s = 10 * np.log10((lg[skip:skip + 48000] ** 2).mean()
                          / max((e ** 2).mean(), 1e-300))
        best = max(best, s)
    assert best > 40


@needs_aac
def test_ps_flagged_not_silent():
    """HE-AAC v2 (PS) streams are flagged; decode continues SBR-only
    at the doubled rate instead of silently wrong output."""
    adts = _core_adts(seconds=0.5)
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    he = splice_sbr_adts(adts, hdr, env_q=[70], noise_q=[25],
                         ps=True)
    mine, dec = _decode_mine(he)
    assert dec.sbr_present and dec.ps_present
    assert dec.output_rate == 48000
    assert mine.shape[0] % 2048 == 0


@needs_aac
def test_faad_element_he_output_rate():
    """The faad element reports HE-AAC buffers at the doubled rate."""
    from gstreamer_tpu.core.buffer import Buffer
    from gstreamer_tpu.elements.aacdec import Faad
    adts = _core_adts(seconds=0.5)
    hdr = S.SbrHeader(amp_res=1, start_freq=5, stop_freq=3)
    he = splice_sbr_adts(adts, hdr, env_q=[70], noise_q=[25])
    frames = []
    pos = 0
    while pos + 7 <= len(he):
        ah = parse_adts_header(he, pos)
        if ah is None:
            break
        frames.append(he[pos:pos + ah[0]])
        pos += ah[0]
    el = Faad()
    el.start()
    out = el.host_process(Buffer(data=frames, batch=len(frames)))
    assert out is not None
    n = np.asarray(out.data).shape[0]
    assert n == 2048 * len(frames)
    # duration implies 48 kHz
    assert abs(out.duration - n * 1_000_000_000 // 48000) <= 1
