"""Net clock sync over localhost UDP (libgstnet equivalent)."""

import time

import numpy as np
import pytest

from gstreamer_tpu.net import (NetClientClock, NetTimePacket,
                               NetTimeProvider, SystemClock)


class TestPacket:
    def test_roundtrip_be(self):
        p = NetTimePacket(local_time=0x0102030405060708,
                          remote_time=0x1112131415161718)
        b = p.to_bytes()
        assert b[:8] == bytes([1, 2, 3, 4, 5, 6, 7, 8])  # big endian
        q = NetTimePacket.from_bytes(b)
        assert q.local_time == p.local_time
        assert q.remote_time == p.remote_time


class _OffsetClock(SystemClock):
    def __init__(self, offset_ns):
        self.offset = offset_ns

    def get_time(self):
        return time.monotonic_ns() + self.offset


class TestNetClock:
    def test_client_syncs_to_provider_offset(self):
        offset = 5_000_000_000          # provider runs 5s ahead
        prov = NetTimeProvider(clock=_OffsetClock(offset))
        try:
            cli = NetClientClock("127.0.0.1", prov.port)
            # spread observations so the regression has a usable time
            # span (RTT jitter / span sets the slope noise floor)
            for _ in range(10):
                assert cli.observe()
                time.sleep(0.005)
            err = cli.get_time() - (time.monotonic_ns() + offset)
            # localhost RTT ~ microseconds; allow 5 ms skew
            assert abs(err) < 5_000_000, err
            m, b, r2 = cli.calibration
            assert abs(m - 1.0) < 0.05
            cli.close()
        finally:
            prov.stop()

    def test_stale_response_rejected(self):
        prov = NetTimeProvider()
        try:
            cli = NetClientClock("127.0.0.1", prov.port)
            assert cli.observe()
            assert len(cli.round_trips) == 1
            cli.close()
        finally:
            prov.stop()

    def test_linear_regression(self):
        from gstreamer_tpu.net.clock import linear_regression
        xs = list(range(0, 1000, 100))
        ys = [2 * x + 37 for x in xs]
        m, b, r2 = linear_regression(xs, ys)
        assert abs(m - 2.0) < 1e-12 and abs(b - 37.0) < 1e-6
        assert r2 > 0.999999
