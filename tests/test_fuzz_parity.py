"""Adversarial parity fuzz against the live reference binary: fresh
random genomes, our own index builder, and deliberately nasty reads
(homopolymers, all-N, length-boundary 14-17, leading/mid Ns,
contig-crossing, tandem repeats, lowercase, 8% mutation). Unmapped-read
FLAGs are normalized (the reference's are uninitialized memory).

Skipped when the reference binary isn't built
(`bash tools/build_reference.sh`)."""

import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/tmp/dart_ref/bin/dart"

sys.path.insert(0, os.path.join(REPO, "tools"))


def _norm(path):
    out = []
    for line in open(path):
        p = line.rstrip("\n").split("\t")
        if len(p) > 4 and p[2] == "*":
            p[1] = "4"
        out.append("\t".join(p))
    return out


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference binary not built")
@pytest.mark.parametrize("seed", [1, 8])
def test_adversarial_parity(tmp_path, seed):
    import make_fixtures as mf

    rng = random.Random(seed * 7 + 1)
    genome = mf.make_genome(rng, {"cA": 30000, "cB": 20000}, n_runs=3)
    cA, genes = mf.plant_genes(rng, genome["cA"], n_genes=4)
    genome["cA"] = cA
    fa = tmp_path / "g.fa"
    mf.write_fasta(str(fa), sorted(genome.items()))
    reads = []
    reads += mf.sim_reads_genomic(rng, genome, 40, 100, 0.0, tag="e")
    reads += mf.sim_reads_genomic(rng, genome, 40, 100, 0.08, tag="h")
    reads += mf.sim_reads_spliced(rng, "cA", genome["cA"], genes, 30, 100,
                                  0.02, tag="s")
    reads += [
        ("polyA", "A" * 100), ("polyAT", "AT" * 50), ("allN", "N" * 80),
        ("tiny", "ACGTACGTAC"),
        ("len14", genome["cB"][500:514]), ("len15", genome["cB"][500:515]),
        ("len16", genome["cB"][500:516]), ("len17", genome["cB"][500:517]),
        ("midN", genome["cB"][1000:1050] + "N" * 5 + genome["cB"][1055:1100]),
        ("leadN", "N" * 20 + genome["cB"][2000:2080]),
        ("bound", genome["cA"][-50:] + genome["cB"][:50]),
        ("revc", mf.revcomp(genome["cB"][3000:3100])),
        ("lower", genome["cB"][4000:4100].lower()),
        ("rep", genome["cB"][5000:5020] * 5),
    ]
    rng.shuffle(reads)
    rfa = tmp_path / "r.fa"
    mf.write_reads_fasta(str(rfa), reads)
    prefix = str(tmp_path / "idx")
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    subprocess.run([sys.executable, "-m", "dart_tpu.cli", "index", str(fa),
                    prefix], check=True, capture_output=True, env=env)
    subprocess.run([REF, "-i", prefix, "-f", str(rfa), "-t", "1", "-mis", "6",
                    "-o", str(tmp_path / "ref.sam"),
                    "-j", str(tmp_path / "ref.tab"), "-silent"],
                   check=True, capture_output=True)
    subprocess.run([sys.executable, "-m", "dart_tpu.cli", "-i", prefix,
                    "-f", str(rfa), "-mis", "6",
                    "-o", str(tmp_path / "my.sam"),
                    "-j", str(tmp_path / "my.tab"), "-silent"],
                   check=True, capture_output=True, env=env)
    assert _norm(tmp_path / "ref.sam") == _norm(tmp_path / "my.sam")
    assert (tmp_path / "ref.tab").read_text() == \
        (tmp_path / "my.tab").read_text()
