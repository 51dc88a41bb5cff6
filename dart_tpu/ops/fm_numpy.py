"""Vectorized FM-index operations (NumPy host engine).

Semantics mirror the reference search core exactly
(/root/reference/src/bwt_search.cpp): bidirectional-interval forward
MEM extension via backward search on the reverse-complement side
(BWT_Search :139), occurrence counting with the $-row adjustment
(bwt_occ :43, bwt_occ4 :67), and SA lookup by LF-walking to a sampled
row (bwt_sa :127).

The walks are batched across (read, position) tasks: every task is one
lane of a fixed-step masked loop — the same dataflow the device
automatons use (ops/fm_jax.py narrow, ops/fm_jax_wide.py >2^31), so
results are interchangeable.
"""

from __future__ import annotations

import numpy as np

from ..index.loader import Index


class FMIndexNumpy:
    """Host FM-index with a full per-position cumulative Occ table
    (16 bytes/base) for O(1) vectorized occ lookups."""

    def __init__(self, idx: Index, lean: bool | None = None):
        self.idx = idx
        self.primary = idx.primary
        self.seq_len = idx.seq_len
        self.L2 = idx.L2.astype(np.int64)
        self.bwt = idx.bwt
        # lean mode (auto for big genomes): occ from the 128-base .bwt
        # checkpoints + an in-window count, instead of a full
        # per-position table (16 bytes/base — 100 GB at GRCh38 scale)
        self.lean = (idx.seq_len > (1 << 28)) if lean is None else lean
        if not self.lean:
            # occ_full[p, c] = #occurrences of c in stored bwt[0:p]
            onehot = idx.bwt[:, None] == np.arange(4, dtype=np.uint8)
            self.occ_full = np.zeros((idx.seq_len + 1, 4), dtype=np.int64)
            np.cumsum(onehot, axis=0, out=self.occ_full[1:])
        else:
            self.occ_ck = idx.occ  # (n_blocks+1, 4) int64, every 128
        self.sa_samples = idx.sa_samples
        self.sa_intv = idx.sa_intv

    # ---- primitives ----

    def _occ4_positions(self, p: np.ndarray) -> np.ndarray:
        """Counts of each base in stored bwt[0:p] (p in [0, seq_len])."""
        if not self.lean:
            return self.occ_full[p]
        blk = p >> 7
        base = self.occ_ck[blk]
        start = blk << 7
        span = (p - start).astype(np.int64)          # 0..127
        offs = np.arange(128, dtype=np.int64)[None, :]
        win = self.bwt[np.minimum(start[:, None] + offs,
                                  self.seq_len - 1)]
        m = offs < span[:, None]
        cnt = np.stack([((win == c) & m).sum(axis=1) for c in range(4)],
                       axis=1).astype(np.int64)
        return base + cnt

    def occ4(self, k: np.ndarray) -> np.ndarray:
        """Occ(k, c) for all c: counts of c in conceptual BWT rows [0, k]
        excluding the $ row. k == -1 yields 0. Shape (len(k), 4)."""
        k = np.asarray(k, dtype=np.int64)
        kk = k - (k >= self.primary)
        res = self._occ4_positions(np.clip(kk + 1, 0, self.seq_len))
        return np.where((k == -1)[:, None], 0, res)

    def occ(self, k: np.ndarray, c: np.ndarray) -> np.ndarray:
        """Occ(k, c) for per-element base c (bwt_occ semantics incl. the
        k == seq_len special case)."""
        k = np.asarray(k, dtype=np.int64)
        c = np.asarray(c, dtype=np.int64)
        full = self.occ4(np.where(k == self.seq_len, 0, k))
        res = full[np.arange(k.shape[0]), c]
        total = (self.L2[c + 1] - self.L2[c])
        return np.where(k == self.seq_len, total, res)

    # ---- forward MEM walks ----

    def mem_walk_batch(self, chars: np.ndarray, valid: np.ndarray):
        """Batched forward maximal-exact-match walks.

        chars: int8/uint8 (W, Lmax) — per-task forward base codes from
            each start position (code > 3 = ambiguous / stop).
        valid: (W, Lmax) bool — False beyond each task's read end.

        Returns (lens, k0, freq): per task the matched length, the
        forward-interval start row of the final interval, and its width.
        Matches BWT_Search :139-170 (loop until mismatch/ambiguity/end).
        """
        W, Lmax = chars.shape
        c0 = np.minimum(chars[:, 0].astype(np.int64), 3)  # clipped; invalid tasks get len 0 below
        x0 = self.L2[c0] + 1
        x1 = self.L2[3 - c0] + 1
        x2 = self.L2[c0 + 1] - self.L2[c0]

        lens = np.ones(W, dtype=np.int64)
        active = valid[:, 0] & (chars[:, 0] <= 3)
        # tasks whose first char is invalid never start (caller guards);
        # treat as len 0
        lens[~active] = 0

        for pos in range(1, Lmax):
            if not active.any():
                break
            ch = chars[:, pos].astype(np.int64)
            step = active & valid[:, pos] & (ch <= 3)
            # stop tasks with ambiguous char or read end
            active = step.copy()
            if not active.any():
                break
            ai = np.flatnonzero(active)
            tk = self.occ4(x1[ai] - 1)
            tl = self.occ4(x1[ai] - 1 + x2[ai])
            widths = tl - tk                              # (n, 4) per base
            new_x1 = self.L2[:4] + 1 + tk                 # (n, 4)
            # forward-interval starts, derived top-down (BWT_Search :162-165)
            adj = ((x1[ai] <= self.primary) & (x1[ai] + x2[ai] - 1 >= self.primary)).astype(np.int64)
            s3 = x0[ai] + adj
            s2 = s3 + widths[:, 3]
            s1 = s2 + widths[:, 2]
            s0 = s1 + widths[:, 1]
            starts = np.stack([s0, s1, s2, s3], axis=1)
            ci = 3 - ch[ai]
            rows = np.arange(ai.shape[0])
            w = widths[rows, ci]
            ok = w > 0
            upd = ai[ok]
            x0[upd] = starts[rows[ok], ci[ok]]
            x1[upd] = new_x1[rows[ok], ci[ok]]
            x2[upd] = w[ok]
            lens[upd] = pos + 1
            dead = ai[~ok]
            active[dead] = False

        return lens, x0, x2

    # ---- SA lookup ----

    def locate(self, k: np.ndarray) -> np.ndarray:
        """bwt_sa for a batch of rows: LF-walk to a sampled row
        (bwt_search.cpp:127-137 / bwt_invPsi :119)."""
        k = np.asarray(k, dtype=np.int64).copy()
        steps = np.zeros(k.shape[0], dtype=np.int64)
        mask = self.sa_intv - 1
        active = (k & mask) != 0
        while active.any():
            ai = np.flatnonzero(active)
            ka = k[ai]
            # invPsi
            x = ka - (ka > self.primary)
            c = self.bwt[x].astype(np.int64)
            nxt = self.L2[c] + self.occ(ka, c)
            nxt = np.where(ka == self.primary, 0, nxt)
            k[ai] = nxt
            steps[ai] += 1
            active[ai] = (nxt & mask) != 0
        return steps + self.sa_samples[k // self.sa_intv]

    # ---- local search (BWT_LocalSearch :184-261) ----

    def local_search(self, codes: np.ndarray, start: int, stop: int,
                     l_boundary: int, r_boundary: int, max_intron: int):
        """Scalar port of BWT_LocalSearch: walk forward keeping the last
        interval with 1 < width < 100; then pick the occurrence closest
        to the relevant boundary. Returns (length, gPos) or (0, -1)."""
        p = int(codes[start])
        if p > 3:
            return 0, -1
        x0 = int(self.L2[p]) + 1
        x1 = int(self.L2[3 - p]) + 1
        x2 = int(self.L2[p + 1] - self.L2[p])
        u = (x0, x1, x2)
        best_len = 0
        pos = start + 1
        while pos < stop:
            if codes[pos] > 3:
                break
            tk = self.occ4(np.array([x1 - 1]))[0]
            tl = self.occ4(np.array([x1 - 1 + x2]))[0]
            widths = tl - tk
            adj = 1 if (x1 <= self.primary and x1 + x2 - 1 >= self.primary) else 0
            s3 = x0 + adj
            s2 = s3 + int(widths[3])
            s1 = s2 + int(widths[2])
            s0 = s1 + int(widths[1])
            starts = (s0, s1, s2, s3)
            i = 3 - int(codes[pos])
            w = int(widths[i])
            if w == 0:
                break
            x0, x1, x2 = starts[i], int(self.L2[i]) + 1 + int(tk[i]), w
            if 1 < x2 < 100:
                u = (x0, x1, x2)
                best_len = pos - start + 1
            pos += 1
        # Post-loop acceptance (bwt_search.cpp:225-229): take the full-walk
        # interval if it stayed rare, or if its first occurrence lands in
        # the window (short-circuit: bwt_sa only called when needed).
        take_ik = False
        if best_len == 0 and x2 < 10000:
            take_ik = True
        else:
            g = int(self.locate(np.array([x0]))[0])
            if l_boundary <= g < r_boundary:
                take_ik = True
        if take_ik:
            best_len = pos - start
            u = (x0, x1, x2)
        if best_len <= 0:
            return 0, -1
        rows = np.arange(u[0], u[0] + u[2], dtype=np.int64)
        locs = self.locate(rows)
        in_win = (locs >= l_boundary) & (locs < r_boundary)
        if not in_win.any():
            return 0, -1
        cand = locs[in_win]
        if start == 0:
            dist = r_boundary - cand
        else:
            dist = cand - l_boundary
        dist = np.where(dist < max_intron, dist, max_intron)
        best = int(cand[np.argmin(dist)]) if (dist < max_intron).any() else -1
        if best < 0:
            return 0, -1
        return best_len, best
