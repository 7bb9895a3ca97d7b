"""Audio ring buffer + base sink (gstaudioringbuffer.c /
gstaudiobasesink.c reduced) and RTP session management (rtpmanager)."""

import numpy as np
import pytest

from gstreamer_tpu.audio.info import AudioInfo
from gstreamer_tpu.audio.ringbuffer import (AudioRingBuffer,
                                            AudioRingBufferSpec)
from gstreamer_tpu.core.parse import parse_launch
from gstreamer_tpu.net.rtp import rtp_header
from gstreamer_tpu.net.rtpmanager import RtpSession, RtpSource


def make_ring(rate=48000, latency_us=10_000, buffer_us=100_000):
    info = AudioInfo(format="S16LE", rate=rate, channels=2)
    spec = AudioRingBufferSpec(info, latency_us * 1000, buffer_us * 1000)
    rb = AudioRingBuffer()
    rb.acquire(spec)
    rb.start()
    return rb, spec


class TestRingBuffer:
    def test_geometry(self):
        rb, spec = make_ring()
        assert spec.samples_per_seg == 480      # 10 ms at 48 kHz
        assert spec.segtotal == 10

    def test_commit_read_delay(self):
        rb, spec = make_ring()
        data = np.arange(960 * 2, dtype=np.int16).reshape(960, 2)
        written = rb.commit(0, data)
        assert written == 960
        assert rb.delay() == 960
        assert rb.samples_done() == 0
        np.testing.assert_array_equal(rb.read(0, 960), data)

    def test_advance_plays_segments(self):
        rb, spec = make_ring()
        sps = spec.samples_per_seg
        rb.commit(0, np.ones((3 * sps, 2), np.int16))
        rb.advance(2)
        assert rb.samples_done() == 2 * sps
        assert rb.delay() == sps

    def test_commit_clips_played_and_overrun(self):
        rb, spec = make_ring()
        sps = spec.samples_per_seg
        rb.commit(0, np.ones((sps, 2), np.int16))
        rb.advance(1)                    # sample 0..sps played
        # writing behind the playout clips
        w = rb.commit(0, np.ones((2 * sps, 2), np.int16))
        assert w == sps                  # only the un-played half fits
        # writing beyond capacity clips
        cap = spec.segtotal * sps
        w = rb.commit(sps, np.ones((cap + sps, 2), np.int16))
        assert w == cap                  # [sps, sps+cap) fits

    def test_callback_fires_on_advance(self):
        rb, spec = make_ring()
        consumed = []
        rb.set_callback(consumed.append)
        rb.commit(0, np.ones((2 * spec.samples_per_seg, 2), np.int16))
        rb.advance(2)
        assert consumed == [0, 1]


class TestAudioBaseSink:
    def test_pipeline_render_and_alignment(self):
        p = parse_launch(
            "audiotestsrc num-buffers=4 samplesperbuffer=480 ! "
            "fakeaudiosink name=s")
        p.run()
        sink = p.get_by_name("s")
        # all buffers contiguous: no resyncs, continuous sample counter
        assert sink.resync_count == 0
        assert sink._next_sample == 4 * 480

    def test_skew_resync_on_big_jump(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.elements.audio_sinks import FakeAudioSink
        from gstreamer_tpu.core.caps import Caps
        sink = FakeAudioSink()
        sink.set_info(Caps.from_string(
            "audio/x-raw,format=S16LE,rate=48000,channels=1,"
            "layout=interleaved"), None)
        sink.start()
        data = np.zeros((480, 1), np.int16)
        sink.render(Buffer(data=data, pts=0, batch=1))
        # 500 ms timestamp jump >> alignment threshold: resync via skew
        sink.render(Buffer(data=data, pts=500_000_000, batch=1))
        assert sink.resync_count == 1
        # after the skew shift, a contiguous follow-up stays aligned
        sink.render(Buffer(data=data, pts=510_000_000, batch=1))
        assert sink.resync_count == 1
        sink.stop()


def _pkt(seq, ts, ssrc=0x1234, n=10):
    return rtp_header(96, seq, ts, ssrc) + bytes(n)


class TestRtpSession:
    def test_loss_and_cycles(self):
        s = RtpSession()
        arrival = 0
        # seq 65530..65535, wrap to 0..4, drop 2 of them
        seqs = list(range(65530, 65536)) + [0, 1, 3, 4]
        for q in seqs:
            s.process_packet(_pkt(q, q * 100), arrival_ns=arrival)
            arrival += 1_000_000
        src = s.sources[0x1234]
        assert src.cycles == 1 << 16
        assert src.expected == 11            # 65530..(65536+4)
        assert src.lost == 1                 # seq 2 missing
        assert src.packets == 10

    def test_jitter_constant_spacing_is_zero(self):
        s = RtpSession(clock_rate=90000)
        # perfectly paced: arrival delta matches timestamp delta
        for k in range(50):
            s.process_packet(_pkt(k, k * 3000),
                             arrival_ns=k * 3000 * 1_000_000_000 // 90000)
        # only ns->timestamp-unit rounding residue remains
        assert s.sources[0x1234].jitter < 1e-3

    def test_jitter_grows_with_variance(self):
        s = RtpSession(clock_rate=90000)
        rng = np.random.default_rng(0)
        t = 0
        for k in range(100):
            t = k * 33_366_666 + int(rng.integers(0, 8_000_000))
            s.process_packet(_pkt(k, k * 3000), arrival_ns=t)
        assert s.sources[0x1234].jitter > 10

    def test_rtpsession_element_passthrough(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.net.rtpmanager import RtpSessionElement
        el = RtpSessionElement()
        el.start()
        pkts = [_pkt(k, k * 3000) for k in range(5)]
        out = el.host_process(Buffer(data=list(pkts), batch=1))
        assert out.data == pkts
        st = el.get_stats()
        assert st["num-sources"] == 1
        assert st["sources"][0]["packets-received"] == 5

    def test_rtpbin_reorders_and_counts(self):
        from gstreamer_tpu.core.buffer import Buffer
        from gstreamer_tpu.net.rtpmanager import RtpBin
        el = RtpBin()
        el.start()
        pkts = {k: _pkt(k, k * 3000) for k in range(6)}
        order = [0, 2, 1, 3, 5, 4]
        out = el.host_process(
            Buffer(data=[pkts[k] for k in order], batch=1))
        flushed = el.host_process(None)      # EOS drain
        got = []
        for b in (out, flushed):
            if b is not None:
                got += [bytes(p) for p in b.data]
        assert got == [pkts[k] for k in range(6)]
        assert el.get_session_stats()["sources"][0][
            "packets-received"] == 6


class TestRtcp:
    def test_rr_sdes_roundtrip(self):
        from gstreamer_tpu.net.rtcp import (TYPE_RR, TYPE_SDES,
                                            parse_compound)
        s = RtpSession(clock_rate=90000)
        for k in [0, 1, 3, 4, 5]:          # one lost (seq 2)
            s.process_packet(_pkt(k, k * 3000), arrival_ns=k * 33_000_000)
        data = s.create_rtcp(sender_ssrc=0xABCD, cname="tpu@test")
        pkts = parse_compound(data)
        assert [p.ptype for p in pkts] == [TYPE_RR, TYPE_SDES]
        rr = pkts[0]
        assert rr.ssrc == 0xABCD
        rb = rr.reports[0]
        assert rb.ssrc == 0x1234
        assert rb.cumulative_lost == 1
        assert rb.extended_seq == 5
        # 1 lost of 6 expected -> fraction = 256/6
        assert rb.fraction_lost == (1 << 8) // 6
        assert pkts[1].sdes == [(0xABCD, "tpu@test")]

    def test_interval_fraction_resets(self):
        from gstreamer_tpu.net.rtcp import parse_compound
        s = RtpSession()
        for k in [0, 1, 3]:
            s.process_packet(_pkt(k, 0), arrival_ns=k)
        s.create_rtcp(1)                    # snapshot taken
        for k in [4, 5, 6]:                 # clean interval
            s.process_packet(_pkt(k, 0), arrival_ns=k)
        pkts = parse_compound(s.create_rtcp(1))
        assert pkts[0].reports[0].fraction_lost == 0
        assert pkts[0].reports[0].cumulative_lost == 1

    def test_sr_pack_parse(self):
        from gstreamer_tpu.net.rtcp import (RtcpPacket, TYPE_SR,
                                            ntp_time, parse_compound)
        sr = RtcpPacket(ptype=TYPE_SR, ssrc=7, ntp=ntp_time(1000.5),
                        rtp_ts=90000, packet_count=10, octet_count=1000)
        pkts = parse_compound(sr.pack())
        assert pkts[0].ptype == TYPE_SR
        assert pkts[0].packet_count == 10
        assert pkts[0].ntp >> 32 == 1000 + 2208988800

    def test_bye_removes_source(self):
        from gstreamer_tpu.net.rtcp import RtcpPacket, TYPE_BYE
        s = RtpSession()
        s.process_packet(_pkt(0, 0), arrival_ns=0)
        assert 0x1234 in s.sources
        s.process_rtcp(RtcpPacket(ptype=TYPE_BYE,
                                  bye_ssrcs=[0x1234]).pack())
        assert 0x1234 not in s.sources
