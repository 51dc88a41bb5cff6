"""BAM output: decode our BGZF/BAM container and check the records
against the golden SAM, field for field.

Note a deliberate divergence from the reference: the reference emits
the strand tag as a space-joined "XS:i:N XS:A:±" blob inside one SAM
column (Mapping.cpp sprintf + XS_A_Str), which htslib's sam_parse1
silently truncates when converting to BAM — reference BAM files lose
the XS:A tag entirely. We encode it as a proper separate tag."""

import gzip
import io
import struct

import pytest

from dart_tpu.aligner import DartAligner
from dart_tpu.config import DartConfig

CIGAR_OPS = "MIDNSHP=X"
SEQ_NT16 = "=ACMGRSVTWYHKDBN"


def decode_bam(path):
    data = gzip.decompress(open(path, "rb").read())
    assert data[:4] == b"BAM\x01"
    l_text = struct.unpack("<i", data[4:8])[0]
    header_text = data[8:8 + l_text].decode()
    off = 8 + l_text
    n_ref = struct.unpack("<i", data[off:off + 4])[0]
    off += 4
    refs = []
    for _ in range(n_ref):
        l_name = struct.unpack("<i", data[off:off + 4])[0]
        name = data[off + 4:off + 4 + l_name - 1].decode()
        ln = struct.unpack("<i", data[off + 4 + l_name:off + 8 + l_name])[0]
        refs.append((name, ln))
        off += 8 + l_name
    records = []
    while off < len(data):
        bs = struct.unpack("<i", data[off:off + 4])[0]
        rec = data[off + 4:off + 4 + bs]
        off += 4 + bs
        (ref_id, pos, lrn, mapq, _bin, ncig, flag, lseq, nref, npos,
         tlen) = struct.unpack("<iiBBHHHiiii", rec[:32])
        p = 32
        name = rec[p:p + lrn - 1].decode()
        p += lrn
        cig = []
        for _ in range(ncig):
            v = struct.unpack("<I", rec[p:p + 4])[0]
            cig.append(f"{v >> 4}{CIGAR_OPS[v & 15]}")
            p += 4
        seq = []
        for i in range(lseq):
            b = rec[p + i // 2]
            code = (b >> 4) if i % 2 == 0 else (b & 15)
            seq.append(SEQ_NT16[code])
        p += (lseq + 1) // 2
        qual = rec[p:p + lseq]
        p += lseq
        tags = []  # list: XS:i (sub-score) and XS:A (strand) coexist
        while p < len(rec):
            tag = rec[p:p + 2].decode()
            typ = chr(rec[p + 2])
            p += 3
            if typ == "C":
                tags.append((tag, rec[p])); p += 1
            elif typ == "c":
                tags.append((tag, struct.unpack("<b", rec[p:p + 1])[0])); p += 1
            elif typ == "S":
                tags.append((tag, struct.unpack("<H", rec[p:p + 2])[0])); p += 2
            elif typ == "s":
                tags.append((tag, struct.unpack("<h", rec[p:p + 2])[0])); p += 2
            elif typ == "i":
                tags.append((tag, struct.unpack("<i", rec[p:p + 4])[0])); p += 4
            elif typ == "A":
                tags.append((tag, chr(rec[p]))); p += 1
            elif typ == "Z":
                e = rec.index(0, p)
                tags.append((tag, rec[p:e].decode())); p = e + 1
            else:
                raise AssertionError(f"unhandled tag type {typ}")
        records.append(dict(name=name, flag=flag, ref_id=ref_id, pos=pos + 1,
                            mapq=mapq, cigar="".join(cig) or "*",
                            next_ref=nref, next_pos=npos + 1, tlen=tlen,
                            seq="".join(seq), qual=qual, tags=tags))
    return header_text, refs, records


@pytest.mark.parametrize("cfgname,reads,golden", [
    ("spliced", ["spliced.fa"], "c3_spliced"),
    ("pe", ["pe_1.fq", "pe_2.fq"], "c5_pe"),
])
def test_bam_matches_sam_golden(toy_index, data_dir, golden_dir, tmp_path,
                                cfgname, reads, golden, capsys):
    cfg = DartConfig()
    cfg.read_files_1 = [str(data_dir / reads[0])]
    if len(reads) > 1:
        cfg.read_files_2 = [str(data_dir / reads[1])]
        cfg.max_mismatch = 5
    cfg.output_format = 1
    cfg.output_file = str(tmp_path / f"{cfgname}.bam")
    cfg.sj_file = str(tmp_path / f"{cfgname}.tab")
    cfg.silent = True
    DartAligner(toy_index, cfg).run()

    header, refs, records = decode_bam(cfg.output_file)
    golden_lines = [l for l in (golden_dir / f"{golden}.sam").read_text()
                    .splitlines() if not l.startswith("@")]
    assert len(records) == len(golden_lines)
    ref_names = [r[0] for r in refs]
    for rec, line in zip(records, golden_lines):
        f = line.split("\t")
        assert rec["name"] == f[0]
        assert rec["flag"] == int(f[1])
        rname = ref_names[rec["ref_id"]] if rec["ref_id"] >= 0 else "*"
        assert rname == f[2]
        assert rec["pos"] == int(f[3]) or f[3] == "0"
        assert rec["mapq"] == int(f[4])
        assert rec["cigar"] == f[5]
        # BAM's 4-bit base encoding is caseless (soft-masked input reads
        # lose lowercase, as with htslib)
        assert rec["seq"] == f[9].upper()
        # tags: every SAM tag (including the space-joined XS:A strand
        # tag the reference loses in BAM mode) must appear in order
        want = []
        for col in f[11:]:
            for part in col.split(" "):
                if part:
                    n, t, v = part.split(":", 2)
                    want.append((n, int(v) if t == "i" else v))
        assert rec["tags"] == want


def test_native_encoder_matches_python(tmp_path, golden_dir):
    """native/bamenc.cpp must produce a byte-identical uncompressed
    record stream to the Python per-record twin, across paired flags,
    unmapped records, and the space-joined XS:A tag quirk."""
    from dart_tpu.io.bam import BamWriter

    for name in ("c5_pe", "c3_spliced", "c2_se_mm"):
        sam_path = golden_dir / f"{name}.sam"
        if not sam_path.exists():
            continue
        text = sam_path.read_text()
        header = [l for l in text.splitlines() if l.startswith("@")]
        body = "".join(l + "\n" for l in text.splitlines()
                       if l and not l.startswith("@"))

        w1 = BamWriter(str(tmp_path / "py.bam"))
        w1.write_header(header)
        for line in body.splitlines():
            w1.write_record(line)
        w1.close()

        w2 = BamWriter(str(tmp_path / "nat.bam"))
        w2.write_header(header)
        w2.write_sam_bytes(body.encode())
        assert w2._ENC not in (None, False), "native encoder unavailable"
        w2.close()

        a = gzip.decompress(open(tmp_path / "py.bam", "rb").read())
        b = gzip.decompress(open(tmp_path / "nat.bam", "rb").read())
        assert a == b, f"record stream mismatch for {name}"
