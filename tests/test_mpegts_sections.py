"""MPEG-TS PSI sections library: parse/write roundtrips for every
table type, DVB time coding vectors, SCTE-35 splice commands and
descriptors, and TS packetization (reference
gst-libs/gst/mpegts/gstmpegtssection.c, gst-dvb-section.c,
gst-scte-section.c)."""

import struct

import pytest

from gstreamer_tpu.utils import mpegts_sections as M


# ----------------------------------------------------------- framing

def test_crc_mismatch_rejected():
    b = bytearray(M.Pat(programs=[(1, 0x100)]).to_bytes())
    b[-7] ^= 0x40
    with pytest.raises(ValueError):
        M.parse_section(bytes(b))


def test_truncated_rejected():
    b = M.Pat(programs=[(1, 0x100)]).to_bytes()
    with pytest.raises(ValueError):
        M.parse_section(b[:-3])


# ------------------------------------------------------ ISO 13818-1

def test_pat_roundtrip():
    pat = M.Pat(transport_stream_id=7,
                programs=[(1, 0x100), (2, 0x200), (0, 0x1E0)],
                version=5)
    sec = M.parse_section(pat.to_bytes())
    assert sec.section_type == "pat"
    assert sec.header.version == 5
    assert sec.table == pat


def test_pmt_roundtrip():
    pmt = M.Pmt(
        program_number=3, pcr_pid=0x101,
        descriptors=[M.Descriptor.registration(b"CUEI")],
        streams=[
            M.PmtStream(0x1B, 0x101,
                        [M.Descriptor.stream_identifier(4)]),
            M.PmtStream(0x0F, 0x102,
                        [M.Descriptor.iso639_language("eng")]),
            M.PmtStream(0x86, 0x1E0,
                        [M.Descriptor.registration(b"CUEI")]),
        ], version=2)
    sec = M.parse_section(pmt.to_bytes())
    assert sec.section_type == "pmt"
    assert sec.table == pmt
    lang, at = sec.table.streams[1].descriptors[0].as_iso639_language()
    assert (lang, at) == ("eng", 0)


def test_cat_tsdt_roundtrip():
    cat = M.Cat(descriptors=[M.Descriptor(0x09, b"\x12\x34\xe1\x00")])
    assert M.parse_section(cat.to_bytes()).table == cat
    tsdt = M.Tsdt(descriptors=[M.Descriptor(0x05, b"GTPU")])
    assert M.parse_section(tsdt.to_bytes()).table == tsdt


# ------------------------------------------------------ DVB tables

def test_dvb_time_standard_vector():
    """EN 300 468 Annex C worked example: 93/10/13 12:45:00 has
    MJD 0xC079."""
    b = M.encode_dvb_time(1993, 10, 13, 12, 45, 0)
    assert struct.unpack(">H", b[:2])[0] == 0xC079
    assert b[2:] == bytes([0x12, 0x45, 0x00])
    assert M.decode_dvb_time(b) == (1993, 10, 13, 12, 45, 0)


@pytest.mark.parametrize("ymd", [
    (2026, 8, 17, 0, 0, 0), (2024, 2, 29, 23, 59, 59),
    (1999, 12, 31, 6, 7, 8), (2030, 1, 1, 12, 0, 0)])
def test_dvb_time_roundtrip(ymd):
    assert M.decode_dvb_time(M.encode_dvb_time(*ymd)) == ymd


def test_nit_roundtrip():
    nit = M.Nit(network_id=0x3001,
                descriptors=[M.Descriptor.network_name("TPU-Net")],
                streams=[M.NitStream(1, 0x2000,
                                     [M.Descriptor(0x43, b"\x01" * 11)]),
                         M.NitStream(2, 0x2000)],
                version=9)
    sec = M.parse_section(nit.to_bytes())
    assert sec.section_type == "nit"
    assert sec.table == nit


def test_sdt_roundtrip():
    sdt = M.Sdt(
        transport_stream_id=1, original_network_id=0x2000,
        services=[M.SdtService(
            service_id=0x100, eit_present_following=True,
            running_status=4,
            descriptors=[M.Descriptor.service(
                0x01, "gstreamer-tpu", "Service One")])],
        version=1)
    sec = M.parse_section(sdt.to_bytes())
    assert sec.section_type == "sdt"
    assert sec.table == sdt
    st, prov, name = sec.table.services[0].descriptors[0].as_service()
    assert (st, prov, name) == (0x01, "gstreamer-tpu", "Service One")


def test_eit_roundtrip():
    eit = M.Eit(
        service_id=0x100, transport_stream_id=1,
        original_network_id=0x2000,
        events=[M.EitEvent(
            event_id=1, start_time=(2026, 8, 17, 20, 15, 0),
            duration=(1, 30, 0), running_status=4,
            descriptors=[M.Descriptor.short_event(
                "eng", "Title", "A description")])],
        version=3)
    sec = M.parse_section(eit.to_bytes())
    assert sec.section_type == "eit"
    assert sec.table == eit
    lang, title, text = \
        sec.table.events[0].descriptors[0].as_short_event()
    assert (lang, title, text) == ("eng", "Title", "A description")


def test_tdt_tot_roundtrip():
    tdt = M.Tdt(utc_time=(2026, 8, 17, 13, 37, 21))
    sec = M.parse_section(tdt.to_bytes())
    assert sec.section_type == "tdt"
    assert sec.table == tdt
    assert sec.header is None            # short section

    tot = M.Tot(utc_time=(2026, 8, 17, 13, 37, 21),
                descriptors=[M.Descriptor(
                    M.DESC_LOCAL_TIME_OFFSET,
                    b"DEU\x02\x01\x00" + M.encode_dvb_time(
                        2026, 10, 25, 3, 0, 0) + b"\x00\x00")])
    sec = M.parse_section(tot.to_bytes())
    assert sec.section_type == "tot"
    assert sec.table == tot


def test_tot_crc_enforced():
    b = bytearray(M.Tot().to_bytes())
    b[5] ^= 1
    with pytest.raises(ValueError):
        M.parse_section(bytes(b))


# --------------------------------------------------------- SCTE-35

def test_scte_null():
    sec = M.parse_section(M.ScteSit.null_new().to_bytes())
    assert sec.section_type == "scte-sit"
    assert sec.table.splice_command_type == M.SCTE_SPLICE_COMMAND_NULL
    assert sec.table.fully_parsed


def test_scte_splice_out_in():
    out = M.ScteSit.splice_out_new(42, 90000 * 10, 90000 * 30)
    t = M.parse_section(out.to_bytes()).table
    ev = t.splices[0]
    assert ev.out_of_network_indicator
    assert ev.program_splice_time == 90000 * 10
    assert ev.duration_flag and ev.break_duration == 90000 * 30
    assert ev.break_duration_auto_return

    back = M.ScteSit.splice_in_new(42, 90000 * 40)
    ev = M.parse_section(back.to_bytes()).table.splices[0]
    assert not ev.out_of_network_indicator
    assert ev.program_splice_time == 90000 * 40


def test_scte_cancel():
    ev = M.parse_section(
        M.ScteSit.cancel_new(1234).to_bytes()).table.splices[0]
    assert ev.splice_event_id == 1234
    assert ev.splice_event_cancel_indicator


def test_scte_time_signal():
    t = M.parse_section(
        M.ScteSit.time_signal_new(0x1_2345_6789).to_bytes()).table
    assert t.splice_command_type == M.SCTE_SPLICE_COMMAND_TIME
    assert t.splice_time_specified
    assert t.splice_time == 0x1_2345_6789
    t = M.parse_section(M.ScteSit.time_signal_new(None).to_bytes()).table
    assert not t.splice_time_specified


def test_scte_immediate_insert():
    sit = M.ScteSit(
        splice_command_type=M.SCTE_SPLICE_COMMAND_INSERT,
        splices=[M.SpliceEvent(
            splice_event_id=9, out_of_network_indicator=True,
            splice_immediate_flag=True, unique_program_id=0x4747,
            avail_num=1, avails_expected=4)])
    ev = M.parse_section(sit.to_bytes()).table.splices[0]
    assert ev.splice_immediate_flag
    assert not ev.program_splice_time_specified
    assert (ev.unique_program_id, ev.avail_num,
            ev.avails_expected) == (0x4747, 1, 4)


def test_scte_component_splice():
    sit = M.ScteSit(
        splice_command_type=M.SCTE_SPLICE_COMMAND_INSERT,
        splices=[M.SpliceEvent(
            splice_event_id=5, program_splice_flag=False,
            components=[
                M.SpliceComponent(2, True, 90000 * 7),
                M.SpliceComponent(3, False)])])
    ev = M.parse_section(sit.to_bytes()).table.splices[0]
    assert not ev.program_splice_flag
    assert [(c.tag, c.splice_time_specified, c.splice_time)
            for c in ev.components] == [(2, True, 90000 * 7),
                                        (3, False, 0)]


def test_scte_schedule():
    sit = M.ScteSit(
        splice_command_type=M.SCTE_SPLICE_COMMAND_SCHEDULE,
        splices=[
            M.SpliceEvent(insert_event=False, splice_event_id=1,
                          out_of_network_indicator=True,
                          utc_splice_time=0x6666_0000,
                          duration_flag=True,
                          break_duration=90000 * 15,
                          unique_program_id=7),
            M.SpliceEvent(insert_event=False, splice_event_id=2,
                          splice_event_cancel_indicator=True)])
    t = M.parse_section(sit.to_bytes()).table
    assert len(t.splices) == 2
    assert t.splices[0].utc_splice_time == 0x6666_0000
    assert t.splices[0].break_duration == 90000 * 15
    assert t.splices[1].splice_event_cancel_indicator


def test_scte_pts_adjustment_33bit():
    sit = M.ScteSit.time_signal_new(100)
    sit.pts_adjustment = (1 << 32) | 5    # exercises the high bit
    t = M.parse_section(sit.to_bytes()).table
    assert t.pts_adjustment == (1 << 32) | 5


def test_scte_private_command_flagged():
    sit = M.ScteSit(splice_command_type=0xFF,
                    private_command=b"\xde\xad\xbe\xef")
    t = M.parse_section(sit.to_bytes()).table
    assert not t.fully_parsed
    assert t.private_command == b"\xde\xad\xbe\xef"


def test_segmentation_descriptor_roundtrip():
    seg = M.SegmentationDescriptor(
        segmentation_event_id=0xCAFE, duration_90k=90000 * 30,
        upid_type=0x08, upid=b"\x00\x00\x00\x2A",
        segmentation_type_id=0x30,       # provider ad start
        segment_num=1, segments_expected=2)
    d = seg.to_descriptor()
    assert d.tag == M.SCTE_DESC_SEGMENTATION
    back = M.SegmentationDescriptor.from_descriptor(d)
    assert back == seg

    sit = M.ScteSit.time_signal_new(90000)
    sit.descriptors.append(d)
    t = M.parse_section(sit.to_bytes()).table
    assert M.SegmentationDescriptor.from_descriptor(
        t.descriptors[0]) == seg


def test_segmentation_descriptor_restrictions():
    seg = M.SegmentationDescriptor(
        segmentation_event_id=1, delivery_not_restricted=False,
        web_delivery_allowed=False, no_regional_blackout=True,
        archive_allowed=False, device_restrictions=1,
        segmentation_type_id=0x10)
    back = M.SegmentationDescriptor.from_descriptor(
        seg.to_descriptor())
    assert back == seg


# --------------------------------------------------- packetization

def test_packetize_roundtrip_single():
    sit = M.ScteSit.splice_out_new(1, 90000, 90000 * 5)
    ts = M.packetize_section(sit.to_bytes(), pid=0x1E0)
    assert len(ts) == 188
    secs = M.sections_from_packets(ts, 0x1E0)
    assert len(secs) == 1
    assert secs[0].table.splices[0].splice_event_id == 1


def test_packetize_roundtrip_multipacket():
    """A section larger than one TS packet spans packets and is
    reassembled via the pointer_field/continuation rules."""
    eit = M.Eit(events=[
        M.EitEvent(event_id=i, start_time=(2026, 1, 1, i % 24, 0, 0),
                   descriptors=[M.Descriptor.short_event(
                       "eng", f"Event {i}", "x" * 40)])
        for i in range(8)])
    raw = eit.to_bytes()
    assert len(raw) > 188
    ts = M.packetize_section(raw, pid=0x12)
    assert len(ts) % 188 == 0 and len(ts) > 188
    secs = M.sections_from_packets(ts, 0x12)
    assert len(secs) == 1
    assert secs[0].table == eit


def test_sections_from_packets_back_to_back():
    """Two sections on the same PID in consecutive packets."""
    a = M.packetize_section(M.Pat(programs=[(1, 0x100)]).to_bytes(), 0)
    b = M.packetize_section(
        M.Pat(programs=[(1, 0x100), (2, 0x200)], version=1).to_bytes(),
        0, cc_start=1)
    secs = M.sections_from_packets(a + b, 0)
    assert [len(s.table.programs) for s in secs] == [1, 2]
    assert [s.header.version for s in secs] == [0, 1]
