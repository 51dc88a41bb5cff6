"""Input-shape coverage: multiple -f libraries and long reads."""

import io

import numpy as np

from dart_tpu.aligner import DartAligner
from dart_tpu.config import DartConfig


def _run(toy_index, tmp_path, files, name):
    cfg = DartConfig()
    cfg.read_files_1 = files
    cfg.output_file = str(tmp_path / f"{name}.sam")
    cfg.sj_file = str(tmp_path / f"{name}.tab")
    cfg.silent = True
    out = io.StringIO()
    DartAligner(toy_index, cfg).run(out_stream=out)
    return out.getvalue()


def test_multiple_input_files(toy_index, data_dir, tmp_path, capsys):
    """`-f a b` must equal the concatenation of separate runs
    (libraries process sequentially; junction tables merge)."""
    both = _run(toy_index, tmp_path, [str(data_dir / "se_exact.fa"),
                                      str(data_dir / "spliced.fa")], "both")
    one = _run(toy_index, tmp_path, [str(data_dir / "se_exact.fa")], "one")
    two = _run(toy_index, tmp_path, [str(data_dir / "spliced.fa")], "two")

    def body(s):
        return [l for l in s.splitlines() if not l.startswith("@")]

    assert body(both) == body(one) + body(two)


def test_long_reads(toy_index, tmp_path, capsys):
    """Reads far beyond one 128-length bucket (spliced 300-mers) agree
    between the jax automaton and the numpy oracle engine."""
    rng = np.random.default_rng(3)
    ref = toy_index.ref_codes
    bases = "ACGT"
    reads = []
    for i in range(8):
        p = int(rng.integers(0, toy_index.genome_size - 400))
        seq = "".join(bases[c] for c in ref[p:p + 300] if c < 4)
        reads.append((f"L{i}", seq))
    fa = tmp_path / "long.fa"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in reads))

    outs = {}
    for engine in ("numpy", "jax"):
        cfg = DartConfig()
        cfg.engine = engine
        cfg.read_files_1 = [str(fa)]
        cfg.output_file = str(tmp_path / f"long_{engine}.sam")
        cfg.sj_file = str(tmp_path / f"long_{engine}.tab")
        cfg.silent = True
        out = io.StringIO()
        DartAligner(toy_index, cfg).run(out_stream=out)
        outs[engine] = out.getvalue()
    assert outs["numpy"] == outs["jax"]
    assert outs["jax"].count("\t300M\t") >= 6  # full-length alignments
