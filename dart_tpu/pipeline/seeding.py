"""Seeding: tile each read with forward maximal exact matches.

Reference: IdentifySeedPairs (AlignmentCandidates.cpp:181-215) — scan
positions left to right, take the MEM at each, jump past accepted
seeds (len >= 16 and occurrences <= MaxDupNum), else advance by one.

TPU-first restructuring: instead of the reference's sequential
walk-per-position loop, ALL positions' MEM walks run as one batched
kernel (device or vectorized host), then a cheap scalar scan replays
the jump sequence and a second batched pass locates the surviving
seeds' occurrences. Results are identical; the heavy gather work is
embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np

from ..constants import MIN_SEED_LEN
from .structs import SeedPair


class SeedBatch:
    """Per-chunk precomputed MEM walks + located seed occurrences."""

    def __init__(self, reads, mems, seeds_per_read):
        self.reads = reads
        self.mems = mems
        self.seeds_per_read = seeds_per_read


def build_walk_tasks(reads) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten all (read, start-position) MEM tasks of a chunk into a
    fixed-width char matrix for the batched walk kernel."""
    task_read = []
    task_pos = []
    max_len = 0
    for ri, read in enumerate(reads):
        end_pos = read.rlen - 13
        for p in range(max(0, end_pos)):
            if read.codes[p] <= 3:
                task_read.append(ri)
                task_pos.append(p)
                if read.rlen - p > max_len:
                    max_len = read.rlen - p
    W = len(task_read)
    chars = np.full((W, max(1, max_len)), 4, dtype=np.uint8)
    valid = np.zeros((W, max(1, max_len)), dtype=bool)
    for t in range(W):
        read = reads[task_read[t]]
        p = task_pos[t]
        n = read.rlen - p
        chars[t, :n] = read.codes[p:]
        valid[t, :n] = True
    return (np.asarray(task_read, dtype=np.int64),
            np.asarray(task_pos, dtype=np.int64), chars, valid)


def identify_seed_pairs_chunk(fm, reads, max_dup_num: int) -> list[list[SeedPair]]:
    """Produce the reference's seed list for every read of a chunk using
    two batched device passes (walks, then locates)."""
    if not reads:
        return []
    task_read, task_pos, chars, valid = build_walk_tasks(reads)
    if task_read.shape[0] == 0:
        return [[] for _ in reads]
    lens, k0, freq = fm.mem_walks(chars, valid)
    accepted = (freq <= max_dup_num) & (lens >= MIN_SEED_LEN)

    # map (read, pos) -> task index
    task_of = {}
    for t in range(task_read.shape[0]):
        task_of[(int(task_read[t]), int(task_pos[t]))] = t

    # replay the reference scan per read (IdentifySeedPairs :188-211)
    emitted: list[tuple[int, int, int, int, int]] = []  # (read, rPos, len, k0, freq)
    for ri, read in enumerate(reads):
        end_pos = read.rlen - 13
        pos = 0
        while pos < end_pos:
            if read.codes[pos] > 3:
                pos += 1
                continue
            t = task_of[(ri, pos)]
            if accepted[t]:
                emitted.append((ri, pos, int(lens[t]), int(k0[t]), int(freq[t])))
                pos += int(lens[t])
            else:
                pos += 1

    # batched locate of every occurrence of every emitted seed
    rows = []
    for _, _, _, k, f in emitted:
        rows.append(np.arange(k, k + f, dtype=np.int64))
    all_rows = np.concatenate(rows) if rows else np.empty(0, dtype=np.int64)
    locs = fm.locate(all_rows) if all_rows.shape[0] else all_rows

    out: list[list[SeedPair]] = [[] for _ in reads]
    off = 0
    for ri, r_pos, ln, _k, f in emitted:
        for j in range(f):
            g = int(locs[off + j])
            out[ri].append(SeedPair(rPos=r_pos, gPos=g, rLen=ln, gLen=ln,
                                    PosDiff=g - r_pos, bSimple=True))
        off += f
    for seeds in out:
        seeds.sort(key=lambda s: (s.gPos, s.rPos))
    return out
