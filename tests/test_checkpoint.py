"""Checkpoint/resume: a run killed mid-stream must resume from the
last completed chunk and still produce the golden output byte-for-byte
(SAM, junction table, and summary counters)."""

import pytest

from dart_tpu.aligner import DartAligner
from dart_tpu.config import DartConfig


def _cfg(data_dir, tmp_path):
    cfg = DartConfig()
    cfg.read_files_1 = [str(data_dir / "spliced.fa")]
    cfg.output_file = str(tmp_path / "out.sam")
    cfg.sj_file = str(tmp_path / "junctions.tab")
    cfg.batch_reads = 256
    cfg.checkpoint = True
    cfg.silent = True
    return cfg


def test_resume_after_interrupt(toy_index, data_dir, golden_dir, tmp_path,
                                capsys):
    cfg = _cfg(data_dir, tmp_path)
    al = DartAligner(toy_index, cfg)
    assert al.native is not None
    calls = {"n": 0}
    orig = al.native.process_chunk

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return orig(*a, **kw)

    al.native.process_chunk = flaky
    with pytest.raises(RuntimeError):
        al.run()
    assert (tmp_path / "out.sam.ckpt").exists()

    # fresh process: resume and finish
    al2 = DartAligner(toy_index, _cfg(data_dir, tmp_path))
    al2.run()

    assert (tmp_path / "out.sam").read_text() == \
        (golden_dir / "c3_spliced.sam").read_text()
    assert (tmp_path / "junctions.tab").read_text() == \
        (golden_dir / "c3_spliced.junctions.tab").read_text()
    assert not (tmp_path / "out.sam.ckpt").exists()
    assert al2.counters["total"] == 600


def test_resume_bam_output(toy_index, data_dir, golden_dir, tmp_path,
                           capsys):
    """BAM checkpoint: offsets are BGZF block boundaries, so truncate +
    append resumes to a valid stream whose records match the golden."""
    import sys

    sys.path.insert(0, str(data_dir.parent))
    from test_bam import decode_bam

    def cfg():
        c = DartConfig()
        c.read_files_1 = [str(data_dir / "spliced.fa")]
        c.output_file = str(tmp_path / "out.bam")
        c.sj_file = str(tmp_path / "junctions.tab")
        c.batch_reads = 256
        c.checkpoint = True
        c.output_format = 1
        c.silent = True
        return c

    al = DartAligner(toy_index, cfg())
    assert al.native is not None
    calls = {"n": 0}
    orig = al.native.process_chunk

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return orig(*a, **kw)

    al.native.process_chunk = flaky
    with pytest.raises(RuntimeError):
        al.run()
    assert (tmp_path / "out.bam.ckpt").exists()

    al2 = DartAligner(toy_index, cfg())
    al2.run()

    golden = [l for l in
              (golden_dir / "c3_spliced.sam").read_text().splitlines()
              if not l.startswith("@")]
    _, _, records = decode_bam(str(tmp_path / "out.bam"))
    assert len(records) == len(golden)
    for rec, line in zip(records, golden):
        f = line.split("\t")
        assert rec["name"] == f[0] and rec["flag"] == int(f[1])
        assert rec["pos"] == int(f[3]) and rec["cigar"] == f[5]
    assert not (tmp_path / "out.bam.ckpt").exists()
    assert al2.counters["total"] == 600
