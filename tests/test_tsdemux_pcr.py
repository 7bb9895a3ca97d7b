"""PCR-accurate tsdemux timing: PCR-clock timestamps, 33-bit PCR/PTS
wraparound, PCR discontinuities (running time continues), and
continuity-counter gap detection (warning message + DISCONT flag).

Reference machinery being re-specified:
gst-plugins-bad/gst/mpegtsdemux/mpegtspacketizer.c (PCR groups, wrap,
CC tracking) and tsdemux.c (PTS against the PCR clock)."""

import struct

import numpy as np
import pytest

from gstreamer_tpu.core.buffer import Buffer, BufferFlags
from gstreamer_tpu.core.element import element_factory_make as make
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.elements.mpegts import PKT, TsDemux, _pes, _ts_packet
from gstreamer_tpu.utils import mpegts_sections as S

PTS_WRAP_NS = (1 << 33) * 1_000_000_000 // 90000   # ~26.5 h


def build_ts(path, units, base_pts90=0, pcr_every=2,
             discont_at=None, pcr_base_offset=0):
    """Hand-build a single-program TS: PAT + PMT + one MP3-ish PES
    stream on PID 0x41 with PCR on the same PID.

    units: list of (payload bytes, pts90 relative); PCR written every
    `pcr_every` units at (pts - 900) * 300 + pcr_base_offset*300.
    discont_at: unit index where the adaptation-field discontinuity
    indicator is raised (and PCR/PTS restart at base_pts90).
    """
    out = bytearray()
    cc = {}

    def nxt(pid):
        c = cc.get(pid, 0)
        cc[pid] = (c + 1) & 0xF
        return c

    def psi(pid, sec):
        payload = b"\x00" + sec
        out.extend(_ts_packet(pid, payload.ljust(PKT - 4, b"\xff"),
                              True, nxt(pid)))

    psi(0, S.Pat(transport_stream_id=1, programs=[(1, 0x30)])
        .to_bytes())
    pmt = S.Pmt(program_number=1, pcr_pid=0x41)
    pmt.streams.append(S.PmtStream(0x03, 0x41, []))
    psi(0x30, pmt.to_bytes())

    for i, (payload, pts90) in enumerate(units):
        p = (base_pts90 + pts90) & ((1 << 33) - 1)
        pes = _pes(0xC0, payload, p)
        first = True
        pos = 0
        while pos < len(pes):
            pcr = None
            if first and i % pcr_every == 0:
                pcr = (((base_pts90 + pts90 - 900)
                        + pcr_base_offset) % (1 << 33)) * 300
            room = PKT - 4 - (8 if pcr is not None else 0)
            chunk = pes[pos:pos + room]
            pkt = bytearray(_ts_packet(0x41, chunk, first,
                                       nxt(0x41), pcr=pcr))
            if discont_at == i and first:
                # raise the discontinuity indicator in the AF flags
                assert (pkt[3] >> 4) & 0x2, "needs an AF"
                pkt[5] |= 0x80
            out.extend(pkt)
            pos += len(chunk)
            first = False
    path.write_bytes(bytes(out))
    return bytes(out)


def demux_all(path):
    d = parse_launch(f"tsdemux location={path} ! appsink name=out")
    d.run()
    outs = []
    while (s := d.get_by_name("out").pull_sample()) is not None:
        outs.append(s.buffer)
    return d, outs


UNIT = bytes(range(200))


class TestPcrClock:
    def test_pts_from_pcr_anchored_at_first_pcr(self, tmp_path):
        """Running time = PTS unrolled against the PCR clock, anchored
        at the first PCR — NOT the raw PTS value."""
        path = tmp_path / "a.ts"
        base = 90000 * 100          # stream starts at PTS 100 s
        units = [(UNIT, k * 9000) for k in range(6)]   # 100 ms apart
        build_ts(path, units, base_pts90=base)
        _, outs = demux_all(path)
        assert len(outs) == 6
        # first PCR = base - 900 (10 ms before the first PTS)
        assert outs[0].pts == 900 * 1_000_000_000 // 90000
        for k, b in enumerate(outs):
            expect = (900 + 9000 * k) * 1_000_000_000 // 90000
            assert abs(b.pts - expect) <= 1

    def test_pts_wraparound_continuous(self, tmp_path):
        """PTS/PCR crossing the 33-bit wrap: running time stays
        monotonic and continuous across the wrap."""
        path = tmp_path / "w.ts"
        base = (1 << 33) - 2 * 9000   # wraps after ~2 units
        units = [(UNIT, k * 9000) for k in range(6)]
        build_ts(path, units, base_pts90=base, pcr_every=1)
        _, outs = demux_all(path)
        ptss = [b.pts for b in outs]
        assert len(ptss) == 6
        deltas = [b - a for a, b in zip(ptss, ptss[1:])]
        step = 9000 * 1_000_000_000 // 90000
        assert all(abs(d - step) <= 2 for d in deltas), deltas
        # sanity: raw PTS itself would have jumped by ~26.5 h
        assert max(ptss) < PTS_WRAP_NS // 2

    def test_pcr_discontinuity_running_time_continues(self, tmp_path):
        """A flagged PCR discontinuity restarting the clock at 0 must
        NOT reset running time: it continues from the previous rate
        (tsdemux's timestamp-group behavior)."""
        path = tmp_path / "d.ts"
        units = [(UNIT, k * 9000) for k in range(4)] \
            + [(UNIT, (k - 4) * 9000) for k in range(4, 8)]
        # second half: PTS restarts at 0 (new clock) with the AF
        # discontinuity indicator on unit 4
        out = bytearray()
        seg1 = build_ts(path, units[:4], base_pts90=90000 * 50,
                        pcr_every=1)
        path2 = tmp_path / "d2.ts"
        seg2 = build_ts(path2, units[4:], base_pts90=900,
                        pcr_every=1, discont_at=0)
        path.write_bytes(seg1 + seg2)
        d, outs = demux_all(path)
        demux = [e for e in d.elements if isinstance(e, TsDemux)][0]
        assert demux.pcr_discontinuities == 1
        ptss = [b.pts for b in outs]
        assert len(ptss) == 8
        deltas = [b - a for a, b in zip(ptss, ptss[1:])]
        step = 9000 * 1_000_000_000 // 90000
        # across the splice the estimated continuation keeps running
        # time monotonic and close to the nominal step
        assert all(0 < dlt < 3 * step for dlt in deltas), deltas

    def test_backwards_jump_without_flag_is_discontinuity(self,
                                                          tmp_path):
        """An unflagged PCR jump far beyond the wrap-half threshold is
        treated as a discontinuity, not a wrap."""
        path = tmp_path / "j.ts"
        seg1 = build_ts(path, [(UNIT, k * 9000) for k in range(3)],
                        base_pts90=90000 * 1000, pcr_every=1)
        path2 = tmp_path / "j2.ts"
        seg2 = build_ts(path2, [(UNIT, k * 9000) for k in range(3)],
                        base_pts90=90000 * 10, pcr_every=1)
        path.write_bytes(seg1 + seg2)
        d, outs = demux_all(path)
        demux = [e for e in d.elements if isinstance(e, TsDemux)][0]
        assert demux.pcr_discontinuities == 1
        ptss = [b.pts for b in outs]
        assert all(b > a for a, b in zip(ptss, ptss[1:])), ptss


class TestContinuityCounter:
    def _gapped(self, tmp_path, drop_pkt):
        path = tmp_path / "g.ts"
        units = [(bytes([k]) * 600, k * 9000) for k in range(5)]
        raw = build_ts(path, units, pcr_every=1)
        pkts = [raw[i:i + PKT] for i in range(0, len(raw), PKT)]
        del pkts[drop_pkt]
        path.write_bytes(b"".join(pkts))
        return path

    def test_gap_detected_and_warned(self, tmp_path):
        # drop a mid-stream payload packet of PID 0x41 (packets 0-1
        # are PAT/PMT; each unit spans ~4 packets)
        path = self._gapped(tmp_path, 7)
        d, outs = demux_all(path)
        demux = [e for e in d.elements if isinstance(e, TsDemux)][0]
        assert demux.cc_gaps, "gap not detected"
        pid, pkt_i, exp, got = demux.cc_gaps[0]
        assert pid == 0x41
        msgs = [m for m in iter(lambda: d.bus.pop(), None)
                if m.type == "warning"
                and m.data.get("name") == "ts-continuity"]
        assert msgs and msgs[0].data["count"] == 1

    def test_discont_flag_on_corrupted_unit(self, tmp_path):
        path = self._gapped(tmp_path, 7)
        _, outs = demux_all(path)
        flags = [bool(b.flags & BufferFlags.DISCONT) for b in outs]
        assert any(flags), "no DISCONT flagged"
        # later units are clean again
        assert not flags[-1]

    def test_clean_stream_no_gaps(self, tmp_path):
        path = tmp_path / "c.ts"
        build_ts(path, [(UNIT, k * 9000) for k in range(4)])
        d, outs = demux_all(path)
        demux = [e for e in d.elements if isinstance(e, TsDemux)][0]
        assert demux.cc_gaps == []
        assert all(not (b.flags & BufferFlags.DISCONT) for b in outs)
