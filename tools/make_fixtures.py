#!/usr/bin/env python3
"""Generate deterministic test fixtures: synthetic genomes, simulated
RNA-seq reads (with splice junctions), and — when the reference dart
binary is available — golden SAM/junction outputs for parity tests.

Genomes and reads are written under tests/data/, goldens under
tests/golden/. Everything is seeded; re-running must be a no-op diff.

The reference binaries are expected at /tmp/dart_ref/bin (built from the
read-only mount by tools/build_reference.sh).
"""

from __future__ import annotations

import argparse
import gzip
import os
import random
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = os.path.join(REPO, "tests", "data")
GOLD = os.path.join(REPO, "tests", "golden")
REF_BIN = "/tmp/dart_ref/bin"

BASES = "ACGT"
COMP = str.maketrans("ACGTN", "TGCAN")


def revcomp(s: str) -> str:
    return s.translate(COMP)[::-1]


def wrap(seq: str, width: int = 70) -> str:
    return "\n".join(seq[i : i + width] for i in range(0, len(seq), width))


def make_genome(rng: random.Random, chrom_lens: dict[str, int], n_runs: int = 2) -> dict[str, str]:
    out = {}
    for name, ln in chrom_lens.items():
        seq = [rng.choice(BASES) for _ in range(ln)]
        for _ in range(n_runs):
            start = rng.randrange(ln - 60)
            for i in range(start, start + rng.randrange(5, 40)):
                seq[i] = "N"
        out[name] = "".join(seq)
    return out


def plant_genes(rng: random.Random, chrom: str, n_genes: int, exons=(80, 220), introns=(60, 8000)):
    """Pick gene structures on a chromosome: lists of exon (start, end).
    Donor/acceptor motifs GT..AG are stamped into the sequence."""
    seq = list(chrom)
    genes = []
    cursor = 200
    limit = len(chrom) - 5000
    for _ in range(n_genes):
        n_ex = rng.randrange(2, 5)
        exs = []
        overrun = False
        for e in range(n_ex):
            elen = rng.randrange(*exons)
            if cursor + elen >= limit:
                overrun = True
                break
            exs.append((cursor, cursor + elen))
            cursor += elen
            if e < n_ex - 1:
                ilen = rng.randrange(*introns)
                if cursor + ilen >= limit:
                    overrun = True
                    break
                # stamp canonical GT/AG at intron ends
                seq[cursor] = "G"
                seq[cursor + 1] = "T"
                seq[cursor + ilen - 2] = "A"
                seq[cursor + ilen - 1] = "G"
                cursor += ilen
        if len(exs) >= 2:
            genes.append(exs)
        if overrun or cursor > limit:
            break
        cursor += rng.randrange(500, 1500)
    return "".join(seq), genes


def sim_reads_genomic(rng, genome, n, rlen, mismatch_rate=0.0, tag="r"):
    """Uniform genomic single-end reads (both strands)."""
    names = sorted(genome)
    reads = []
    for i in range(n):
        chrom = rng.choice(names)
        seq = genome[chrom]
        pos = rng.randrange(len(seq) - rlen)
        frag = seq[pos : pos + rlen]
        strand = rng.random() < 0.5
        if strand:
            frag = revcomp(frag)
        frag = mutate(rng, frag, mismatch_rate)
        reads.append((f"{tag}{i}_{chrom}:{pos+1}-{pos+rlen}{'_R' if strand else '_F'}", frag))
    return reads


def mutate(rng, seq, rate):
    if rate <= 0:
        return seq
    s = list(seq)
    for i in range(len(s)):
        if s[i] != "N" and rng.random() < rate:
            s[i] = rng.choice([b for b in BASES if b != s[i]])
    return "".join(s)


def sim_reads_spliced(rng, chrom_name, chrom_seq, genes, n, rlen, mismatch_rate=0.0, tag="s"):
    """Reads sampled from spliced transcripts (exon concatenations)."""
    reads = []
    transcripts = []
    for exs in genes:
        t = "".join(chrom_seq[a:b] for a, b in exs)
        transcripts.append((t, exs))
    for i in range(n):
        t, exs = transcripts[rng.randrange(len(transcripts))]
        if len(t) <= rlen:
            continue
        pos = rng.randrange(len(t) - rlen)
        frag = t[pos : pos + rlen]
        strand = rng.random() < 0.5
        if strand:
            frag = revcomp(frag)
        frag = mutate(rng, frag, mismatch_rate)
        reads.append((f"{tag}{i}_{chrom_name}:t{pos}{'_R' if strand else '_F'}", frag))
    return reads


def sim_reads_paired(rng, genome, n, rlen, insert=(200, 500), mismatch_rate=0.0, tag="p"):
    names = sorted(genome)
    r1, r2 = [], []
    for i in range(n):
        chrom = rng.choice(names)
        seq = genome[chrom]
        isz = rng.randrange(*insert)
        pos = rng.randrange(len(seq) - isz)
        frag = seq[pos : pos + isz]
        a = mutate(rng, frag[:rlen], mismatch_rate)
        b = mutate(rng, revcomp(frag[-rlen:]), mismatch_rate)
        r1.append((f"{tag}{i}_{chrom}:{pos+1}", a))
        r2.append((f"{tag}{i}_{chrom}:{pos+1}", b))
    return r1, r2


def write_fasta(path, entries, width=70):
    with open(path, "w") as f:
        for name, seq in entries:
            f.write(f">{name}\n{wrap(seq, width)}\n")


def write_reads_fasta(path, reads):
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq}\n")


def write_reads_fastq(path, reads, gz=False):
    if gz:
        # mtime=0 keeps regeneration byte-identical
        import io

        raw = io.BytesIO()
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            for name, seq in reads:
                f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n".encode())
        with open(path, "wb") as out:
            out.write(raw.getvalue())
        return
    with open(path, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-golden", action="store_true")
    args = ap.parse_args()

    os.makedirs(DATA, exist_ok=True)
    os.makedirs(GOLD, exist_ok=True)
    rng = random.Random(20260816)

    # --- toy genome (2 chromosomes, N runs, one lowercase region) ---
    genome = make_genome(rng, {"chrA": 60000, "chrB": 40000})
    # plant spliced genes on chrA
    chrA, genes = plant_genes(rng, genome["chrA"], n_genes=8)
    genome["chrA"] = chrA
    # lowercase stretch on chrB (soft-masking, common in real references)
    b = genome["chrB"]
    genome["chrB"] = b[:5000] + b[5000:5400].lower() + b[5400:]
    write_fasta(os.path.join(DATA, "toy.fa"), sorted(genome.items()))

    with open(os.path.join(DATA, "toy_genes.txt"), "w") as f:
        for exs in genes:
            f.write("chrA\t" + ",".join(f"{a}-{b}" for a, b in exs) + "\n")

    # --- reads ---
    se_exact = sim_reads_genomic(rng, genome, 400, 100, 0.0, tag="e")
    se_mm = sim_reads_genomic(rng, genome, 400, 100, 0.01, tag="m")
    spliced = sim_reads_spliced(rng, "chrA", genome["chrA"], genes, 600, 100, 0.0, tag="s")
    spliced_mm = sim_reads_spliced(rng, "chrA", genome["chrA"], genes, 300, 100, 0.01, tag="t")
    pe1, pe2 = sim_reads_paired(rng, genome, 300, 100, mismatch_rate=0.005, tag="p")

    write_reads_fasta(os.path.join(DATA, "se_exact.fa"), se_exact)
    write_reads_fastq(os.path.join(DATA, "se_mm.fq"), se_mm)
    write_reads_fasta(os.path.join(DATA, "spliced.fa"), spliced)
    write_reads_fastq(os.path.join(DATA, "spliced_mm.fq"), spliced_mm)
    write_reads_fastq(os.path.join(DATA, "pe_1.fq"), pe1)
    write_reads_fastq(os.path.join(DATA, "pe_2.fq"), pe2)
    write_reads_fastq(os.path.join(DATA, "pe_1.fq.gz"), pe1, gz=True)
    write_reads_fastq(os.path.join(DATA, "pe_2.fq.gz"), pe2, gz=True)
    # interleaved PE
    inter = [v for pair in zip(pe1, pe2) for v in pair]
    write_reads_fastq(os.path.join(DATA, "pe_inter.fq"), inter)

    # --- reference index + goldens ---
    bwt_index = os.path.join(REF_BIN, "bwt_index")
    dart = os.path.join(REF_BIN, "dart")
    if args.skip_golden or not (os.path.exists(bwt_index) and os.path.exists(dart)):
        print("reference binaries not found; skipping goldens", file=sys.stderr)
        return

    idx_dir = os.path.join(GOLD, "index")
    os.makedirs(idx_dir, exist_ok=True)
    prefix = os.path.join(idx_dir, "toy")
    subprocess.run([bwt_index, os.path.join(DATA, "toy.fa"), prefix], check=True,
                   capture_output=True)

    configs = [
        ("c1_se_exact", ["-f", os.path.join(DATA, "se_exact.fa")], []),
        ("c2_se_mm", ["-f", os.path.join(DATA, "se_mm.fq")], ["-mis", "5"]),
        ("c3_spliced", ["-f", os.path.join(DATA, "spliced.fa")], []),
        ("c4_spliced_mm", ["-f", os.path.join(DATA, "spliced_mm.fq")], ["-mis", "5", "-all_sj"]),
        ("c5_pe", ["-f", os.path.join(DATA, "pe_1.fq"), "-f2", os.path.join(DATA, "pe_2.fq")],
         ["-mis", "5"]),
        ("c6_pe_gz", ["-f", os.path.join(DATA, "pe_1.fq.gz"), "-f2", os.path.join(DATA, "pe_2.fq.gz")],
         ["-mis", "5"]),
        ("c7_pe_inter", ["-f", os.path.join(DATA, "pe_inter.fq")], ["-p", "-mis", "5"]),
        ("c8_multi", ["-f", os.path.join(DATA, "se_exact.fa")], ["-m"]),
        ("c9_unique", ["-f", os.path.join(DATA, "se_mm.fq")], ["-unique", "-mis", "5"]),
    ]
    for name, inputs, extra in configs:
        sam = os.path.join(GOLD, f"{name}.sam")
        sj = os.path.join(GOLD, f"{name}.junctions.tab")
        cmd = [dart, "-i", prefix, *inputs, "-t", "1", "-o", sam, "-j", sj, "-silent", *extra]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"golden {name} FAILED: {r.stderr}", file=sys.stderr)
            sys.exit(1)
        print(f"golden {name}: ok")


if __name__ == "__main__":
    main()
