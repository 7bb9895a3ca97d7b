#!/usr/bin/env python3
"""Generate gstreamer_tpu/codecs/_aac_tables.py from the system
libavcodec static archive.

The AAC huffman codebooks and scalefactor-band offset tables are
normative constants from ISO/IEC 14496-3 (Tables 4.A.2-4.A.13 and
4.5.x).  Rather than hand-transcribing ~1900 table entries from the
spec (error-prone), this script reads them out of the aactab.o member
of the installed libavcodec.a — the same extraction approach used for
the MP3 tables (tools/gen_mp3_tables.py).  The tables are pure ISO
constants, not code.

Codeword arrays are stored in spec index order (verified against the
packed codebook_vector*_idx arrays, whose base-N digit packing matches
the spec index arithmetic exactly), so the (code, bits) pair at
position k belongs to spec tuple index k.

Usage: python tools/gen_aac_tables.py > gstreamer_tpu/codecs/_aac_tables.py
"""

import struct
import subprocess
import sys
import tempfile
import os

AR = "/usr/lib/x86_64-linux-gnu/libavcodec.a"

# spectral codebook sizes, ISO 14496-3 Table 4.151 (3^4, 9^2, 8^2, ...)
SIZES = [81, 81, 81, 81, 81, 81, 64, 64, 169, 169, 289]


def main():
    with tempfile.TemporaryDirectory() as d:
        subprocess.run(["ar", "x", AR, "aactab.o"], cwd=d, check=True)
        obj = os.path.join(d, "aactab.o")
        rod_bin = os.path.join(d, "rodata.bin")
        subprocess.run(["objcopy", "-O", "binary",
                        "--only-section=.rodata", obj, rod_bin],
                       check=True)
        with open(rod_bin, "rb") as f:
            rod = f.read()
        nm = subprocess.run(["nm", obj], capture_output=True,
                            text=True, check=True).stdout
        sym = {}
        for line in nm.splitlines():
            parts = line.split()
            if len(parts) == 3:
                sym[parts[2]] = int(parts[0], 16)
        rel = subprocess.run(
            ["objdump", "-r", "-j", ".data.rel.ro.local", obj],
            capture_output=True, text=True, check=True).stdout
        relocs = {}
        for line in rel.splitlines():
            parts = line.split()
            if len(parts) == 3 and parts[1] == "R_X86_64_64":
                tgt = parts[2]
                if tgt.startswith(".rodata+"):
                    relocs[int(parts[0], 16)] = int(
                        tgt.split("+")[1], 16)

    def u8(name, n):
        at = sym[name]
        return list(rod[at:at + n])

    def u16(name, n):
        return list(struct.unpack_from("<%dH" % n, rod, sym[name]))

    def u32(name, n):
        return list(struct.unpack_from("<%dI" % n, rod, sym[name]))

    out = sys.stdout
    out.write('"""AAC constant tables (ISO/IEC 14496-3) — GENERATED '
              'by tools/gen_aac_tables.py.\n\nHuffman codebooks in '
              'spec index order as (codeword, length) pairs;\n'
              'scalefactor-band offsets per sampling-frequency '
              'index."""\n\n')

    out.write("SPECTRAL_SIZES = %r\n\n" % (SIZES,))
    for i in range(11):
        bits = u8("bits%d" % (i + 1), SIZES[i])
        codes = u16("codes%d" % (i + 1), SIZES[i])
        out.write("SPEC_BITS_%d = %r\n" % (i + 1, bits))
        out.write("SPEC_CODES_%d = %r\n\n" % (i + 1, codes))
    out.write("SPEC_BITS = [%s]\n" % ", ".join(
        "SPEC_BITS_%d" % (i + 1) for i in range(11)))
    out.write("SPEC_CODES = [%s]\n\n" % ", ".join(
        "SPEC_CODES_%d" % (i + 1) for i in range(11)))

    out.write("SF_BITS = %r\n\n" % u8("ff_aac_scalefactor_bits", 121))
    out.write("SF_CODES = %r\n\n"
              % u32("ff_aac_scalefactor_code", 121))

    out.write("TNS_MAX_BANDS_1024 = %r\n"
              % u8("ff_tns_max_bands_1024", 13))
    out.write("TNS_MAX_BANDS_128 = %r\n\n"
              % u8("ff_tns_max_bands_128", 13))

    num_1024 = u8("ff_aac_num_swb_1024", 13)
    num_128 = u8("ff_aac_num_swb_128", 13)
    out.write("NUM_SWB_1024 = %r\n" % num_1024)
    out.write("NUM_SWB_128 = %r\n\n" % num_128)

    # pointer arrays: 13 slots of 8 bytes each, resolved via relocs
    for arr_name, nums, label in [
            ("ff_swb_offset_1024", num_1024, "SWB_OFFSET_1024"),
            ("ff_swb_offset_128", num_128, "SWB_OFFSET_128")]:
        base = sym[arr_name]
        tables = []
        for k in range(13):
            ro_off = relocs[base + 8 * k]
            n = nums[k] + 1
            tables.append(list(
                struct.unpack_from("<%dH" % n, rod, ro_off)))
        out.write("%s = [\n" % label)
        for t in tables:
            out.write("    %r,\n" % (t,))
        out.write("]\n\n")


if __name__ == "__main__":
    main()
