"""Stock-`bwa index` interoperability (reference README.md:69-72).

The reference documents that indexes built by stock bwa
(`bwa index -p prefix ref.fa`) are accepted in place of its own
bwt_index output. No bwa binary is obtainable on this host (zero
egress), but the claim is testable anyway, because the reference's
BWT_Index/ *is* bwa's index construction code — bwt.c and bntseq.c
carry the 2008 Genome Research Ltd / Heng Li headers and the
bwa-0.6+ 64-bit bwtint_t file format — so a reference-built index IS
a stock-bwa-format index (tests/golden/index/toy), and our whole
golden-parity suite already runs against one.

What a stock bwa build can vary that bwt_index never exercises is the
`.sa` sampling interval: bwt_dump_sa stores sa_intv in the header
(bwt.c:191) and bwt_restore_sa honors whatever value it finds
(bwt.c:220-225) — it is a format parameter, not a constant. These
tests resample the toy `.sa` to interval 64 and assert BOTH the
reference binary and our loader+aligner accept it with identical
output (SA sampling changes locate cost, never results).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_SRC = "/root/reference/src/BWT_Index"
REF_DART = "/tmp/dart_ref/bin/dart"


def test_reference_builder_is_bwa_code():
    """Provenance: the reference's index builder is bwa's own code, so
    the bwa-format interop claim reduces to the parity we already test
    against reference-built indexes."""
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference mount unavailable")
    bwt_c = open(os.path.join(REF_SRC, "bwt.c")).read()
    bnt_c = open(os.path.join(REF_SRC, "bntseq.c")).read()
    assert "Genome Research Ltd" in bwt_c and "lh3@sanger.ac.uk" in bwt_c
    assert "Genome Research Ltd" in bnt_c or "Heng Li" in bnt_c


def _resample_sa(src_prefix: str, dst_prefix: str, factor: int = 2):
    """Copy an index, rewriting .sa to interval sa_intv*factor by
    keeping every factor-th sample — the file a stock bwa built with a
    different bwt_cal_sa interval would produce."""
    for ext in (".bwt", ".pac", ".ann", ".amb"):
        shutil.copy(src_prefix + ext, dst_prefix + ext)
    raw = open(src_prefix + ".sa", "rb").read()
    hdr = np.frombuffer(raw[:56], np.uint64).copy()
    body = np.frombuffer(raw[56:], np.uint64)
    intv, seq_len = int(hdr[5]), int(hdr[6])
    n_sa = (seq_len + intv) // intv
    assert body.shape[0] == n_sa - 1
    sa = np.empty(n_sa, np.uint64)
    sa[0] = np.uint64(2**64 - 1)  # the in-memory $-row sentinel
    sa[1:] = body
    new = sa[::factor]
    new_intv = intv * factor
    assert new.shape[0] == (seq_len + new_intv) // new_intv
    hdr[5] = new_intv
    with open(dst_prefix + ".sa", "wb") as f:
        f.write(hdr.tobytes())
        f.write(new[1:].tobytes())


def test_sa_interval_variant_loader_and_aligner(golden_dir, data_dir,
                                                tmp_path):
    """Our loader + aligner on an interval-64 .sa must equal the
    interval-32 golden output exactly."""
    from dart_tpu.aligner import DartAligner
    from dart_tpu.config import DartConfig
    from dart_tpu.index import load_index

    prefix = str(tmp_path / "toy64")
    _resample_sa(str(golden_dir / "index" / "toy"), prefix)
    idx = load_index(prefix)
    assert idx.sa_intv == 64
    cfg = DartConfig()
    cfg.read_files_1 = [str(data_dir / "spliced.fa")]
    cfg.output_file = str(tmp_path / "out.sam")
    cfg.sj_file = str(tmp_path / "out.tab")
    cfg.silent = True
    DartAligner(idx, cfg).run()
    got = [l for l in open(cfg.output_file) if not l.startswith("@")]
    want = [l for l in open(golden_dir / "c3_spliced.sam")
            if not l.startswith("@")]
    assert got == want


def test_sa_interval_variant_reference_accepts(golden_dir, data_dir,
                                               tmp_path):
    """The reference binary itself accepts the same resampled .sa with
    identical output — i.e. our loader matches the reference's
    behavior on the bwa-format degree of freedom, not just its own
    builder's output."""
    if not os.path.exists(REF_DART):
        pytest.skip("reference binary not built")
    prefix = str(tmp_path / "toy64")
    _resample_sa(str(golden_dir / "index" / "toy"), prefix)
    sam = str(tmp_path / "ref.sam")
    subprocess.run([REF_DART, "-i", prefix,
                    "-f", str(data_dir / "spliced.fa"), "-t", "1",
                    "-o", sam, "-j", str(tmp_path / "ref.tab"),
                    "-silent"], check=True, capture_output=True)
    got = [l for l in open(sam) if not l.startswith("@")]
    want = [l for l in open(golden_dir / "c3_spliced.sam")
            if not l.startswith("@")]
    assert got == want
