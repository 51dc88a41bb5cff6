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
