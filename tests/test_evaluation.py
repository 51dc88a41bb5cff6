"""Evaluation-tool parity: the three metrics programs
(reference Evaluation/: eva, FluxEva, SJ_Eva) as library functions."""

import os

from dart_tpu.evaluation import (
    flux_evaluation,
    general_evaluation,
    parse_truth_region,
    sj_evaluation,
)

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "data")
GOLD = os.path.join(HERE, "golden")


def test_general_evaluation_on_golden():
    r = general_evaluation(os.path.join(GOLD, "c3_spliced.sam"),
                           os.path.join(DATA, "toy.fa"))
    # exact spliced reads against their own genome: everything aligns
    # with ~100% identity
    assert r["total"] == 600
    assert r["aligned"] >= 590
    assert r["sensitivity"] > 0.98
    assert r["avg_seq_identity"] > 0.99


def test_flux_truth_parsing():
    assert parse_truth_region("chr1:100-250W12") == ("chr1", 100, 250)
    assert parse_truth_region("chrX:5-9") == ("chrX", 5, 9)


def test_flux_evaluation(tmp_path):
    sam = tmp_path / "flux.sam"
    lines = [
        "@SQ\tSN:chr1\tLN:1000",
        # correct: chr + pos within span
        "chr1:100-250W1\t0\tchr1\t120\t50\t100M\t*\t0\t0\tAC\tII",
        # wrong chromosome
        "chr2:100-250W2\t0\tchr1\t120\t50\t100M\t*\t0\t0\tAC\tII",
        # mapq 0: excluded from denominator
        "chr1:100-250W3\t0\tchr1\t120\t0\t100M\t*\t0\t0\tAC\tII",
        # unaligned: excluded
        "chr1:100-250W4\t4\t*\t0\t0\t*\t*\t0\t0\tAC\tII",
        # out of span
        "chr1:100-250W5\t0\tchr1\t500\t50\t100M\t*\t0\t0\tAC\tII",
    ]
    sam.write_text("\n".join(lines) + "\n")
    r = flux_evaluation(str(sam))
    assert r["total"] == 5
    assert r["correct"] == 1
    assert r["evaluated"] == 3  # 5 - 1 unaligned - 1 mapq0
    assert abs(r["accuracy_pct"] - 33.3) < 0.11


def test_sj_evaluation_against_planted_genes(tmp_path):
    # truth junctions from the planted gene structures: intron =
    # [exon_end+1, next_exon_start] in 1-based coordinates
    truth = tmp_path / "junctions.txt"
    rows = []
    with open(os.path.join(DATA, "toy_genes.txt")) as f:
        for line in f:
            chrom, exs = line.split("\t")
            exons = [tuple(map(int, p.split("-"))) for p in exs.split(",")]
            for (a1, b1), (a2, b2) in zip(exons, exons[1:]):
                rows.append(f"{chrom}\t{b1 + 1}\t{a2}")
    truth.write_text("\n".join(rows) + "\n")
    r = sj_evaluation(os.path.join(GOLD, "c3_spliced.junctions.tab"),
                      str(truth))
    assert r["reported_sj"] > 10
    assert r["precision_pct"] > 95.0


def test_evaluation_cli(tmp_path, capsys):
    from dart_tpu.cli import main

    rc = main(["eva", os.path.join(GOLD, "c3_spliced.sam"),
               os.path.join(DATA, "toy.fa")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sensitivity = " in out and "AvgSeqIdy" in out

    sj = tmp_path / "truth.txt"
    sj.write_text("chrA\t353\t5067\n")
    rc = main(["sjeva", os.path.join(GOLD, "c3_spliced.junctions.tab"),
               str(sj)])
    assert rc == 0
    assert "Reported SJ" in capsys.readouterr().out
