"""The vectorized blob reader must produce byte-identical records to
the streaming per-record reader on every input shape it accepts."""

import gzip

import numpy as np
import pytest

from dart_tpu.io.fastx import ChunkReader
from dart_tpu.io.fastx_fast import FastChunkReader


def _collect_slow(path, pair_end, chunk):
    r = ChunkReader(path, None, pair_end, chunk_reads=chunk)
    out = []
    while True:
        reads = r.next_chunk()
        if not reads:
            break
        out.append(reads)
    r.close()
    return out


def _collect_fast(path, pair_end, chunk):
    r = FastChunkReader(path, pair_end, chunk)
    out = []
    while True:
        c = r.next_chunk()
        if c is None:
            break
        out.append(c)
    return out


def _compare(path, pair_end=False, chunk=7):
    slow = _collect_slow(path, pair_end, chunk)
    fast = _collect_fast(path, pair_end, chunk)
    assert [len(c) for c in slow] == [len(c) for c in fast]
    for sc, fc in zip(slow, fast):
        for i, read in enumerate(sc):
            assert fc.header(i) == read.header
            assert fc.seq(i) == read.seq
            if fc.fastq:
                q = fc.qual_blob[fc.qual_off[i]:fc.qual_off[i + 1]]
                assert q == read.qual
        codes, rlens = fc.codes_matrix()
        for i, read in enumerate(sc):
            assert rlens[i] == read.rlen
            np.testing.assert_array_equal(codes[i, :read.rlen], read.codes)


def test_fastq_single_end(data_dir):
    _compare(str(data_dir / "se_mm.fq"))


def test_fastq_interleaved_pairs(data_dir):
    _compare(str(data_dir / "pe_inter.fq"), pair_end=True, chunk=10)


def test_fastq_gz(data_dir):
    _compare(str(data_dir / "pe_1.fq.gz"))


def test_fasta_single_line(data_dir):
    _compare(str(data_dir / "se_exact.fa"))


def test_fasta_multiline(tmp_path):
    # wrapped sequence lines + headers with comments and '/' cuts
    p = tmp_path / "wrapped.fa"
    p.write_text(">r1 some comment\nACGTACGT\nGGTT\nA\n"
                 ">r2/2\nTTTT\n"
                 ">r3\nacgtN\nNNAC\n")
    _compare(str(p), chunk=2)


def test_paired_split_files(data_dir):
    from dart_tpu.io.fastx_fast import FastPairedReader

    slow = _collect_slow2(str(data_dir / "pe_1.fq"), str(data_dir / "pe_2.fq"))
    fast = []
    r = FastPairedReader(str(data_dir / "pe_1.fq"), str(data_dir / "pe_2.fq"), 64)
    while True:
        c = r.next_chunk()
        if c is None:
            break
        fast.append(c)
    assert [len(c) for c in slow] == [len(c) for c in fast]
    for sc, fc in zip(slow, fast):
        for i, read in enumerate(sc):
            assert fc.header(i) == read.header
            assert fc.seq(i) == read.seq
            q = fc.qual_blob[fc.qual_off[i]:fc.qual_off[i + 1]]
            assert q == read.qual


def _collect_slow2(p1, p2):
    r = ChunkReader(p1, p2, True, chunk_reads=64)
    out = []
    while True:
        reads = r.next_chunk()
        if not reads:
            break
        out.append(reads)
    r.close()
    return out


def test_chunk_bases_cap_long_reads(tmp_path):
    """Chunk boundaries must match the streaming reader when the base
    cap (not the read count) closes chunks — long-read inputs."""
    import random

    rng = random.Random(7)
    path = tmp_path / "long.fq"
    with open(path, "w") as f:
        for i in range(40):
            L = rng.choice([5000, 20000, 120000])
            seq = "".join(rng.choice("ACGT") for _ in range(L))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * L}\n")
    _compare(str(path), chunk=4000)
    # paired split files: cap counts both mates
    p2 = tmp_path / "long_2.fq"
    with open(p2, "w") as f:
        for i in range(40):
            L = rng.choice([5000, 20000, 120000])
            seq = "".join(rng.choice("ACGT") for _ in range(L))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * L}\n")
    from dart_tpu.io.fastx_fast import FastPairedReader

    slow = ChunkReader(str(path), str(p2), True, chunk_reads=4000)
    fast = FastPairedReader(str(path), str(p2), 4000)
    while True:
        sc = slow.next_chunk()
        fc = fast.next_chunk()
        if not sc:
            assert fc is None
            break
        assert fc is not None and len(sc) == len(fc)
        for i, read in enumerate(sc):
            assert fc.seq(i) == read.seq
