"""JAX/XLA FM-index engine: batched MEM walks and SA locates on device.

TPU-first design:
- The FM-index lives in HBM as a blocked layout: one uint32 row of 8
  words per 64 BWT bases — [occ_A, occ_C, occ_G, occ_T, w0, w1, w2, w3]
  — so each Occ query is a single aligned 32-byte row gather plus
  in-register popcounts (the reference's __occ_aux bit trick,
  bwt_search.cpp:34-41, widened to 32-bit lanes).
- Every (read, start-position) MEM task is one lane of a masked
  fixed-trip scan (jax.lax.scan over read positions); every SA locate
  is one lane of a 31-step masked LF-walk loop. No data-dependent
  control flow — everything jit-compiles to static shapes.
- Row indices are int32: genomes up to 2^31 bases of fwd+RC text
  (~1 Gbp genome) per shard. Larger genomes shard the index over a
  mesh axis (see dart_tpu.parallel).

Results are bit-identical to ops/fm_numpy.FMIndexNumpy (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..index.loader import Index

BLOCK = 64  # bases per occ-checkpoint row


def build_device_layout(idx: Index):
    """Pack the host index into the (n_blocks, 8) uint32 device layout."""
    if idx.seq_len >= 2**31:
        raise ValueError("single-shard FM layout requires seq_len < 2^31")
    n = idx.seq_len
    n_blocks = (n + BLOCK - 1) // BLOCK
    padded = np.zeros(n_blocks * BLOCK, dtype=np.uint8)
    padded[:n] = idx.bwt
    # occ at block starts
    onehot = padded.reshape(n_blocks, BLOCK, 1) == np.arange(4, dtype=np.uint8)
    per_block = onehot.sum(axis=1).astype(np.int64)
    occ_start = np.zeros((n_blocks, 4), dtype=np.int64)
    np.cumsum(per_block[:-1], axis=0, out=occ_start[1:])
    # pack 16 bases/word, first base in top bits
    w = padded.reshape(-1, 16).astype(np.uint32)
    shifts = np.arange(15, -1, -1, dtype=np.uint32) * 2
    words = (w << shifts).sum(axis=1, dtype=np.uint64).astype(np.uint32).reshape(n_blocks, 4)
    blocks = np.concatenate([occ_start.astype(np.uint32), words], axis=1)
    return blocks


class FMIndexJax:
    def __init__(self, idx: Index, device=None, max_dup_num: int = 100):
        blocks = build_device_layout(idx)
        self.blocks = jax.device_put(blocks, device)
        self.L2 = jax.device_put(idx.L2.astype(np.int32), device)
        self.sa_samples = jax.device_put(idx.sa_samples.astype(np.int32), device)
        self.primary = int(idx.primary)
        self.seq_len = int(idx.seq_len)
        self.sa_intv = int(idx.sa_intv)
        self.max_dup_num = int(max_dup_num)
        self._walk_jit = jax.jit(functools.partial(
            _mem_walks_kernel, primary=self.primary))
        self._locate_jit = jax.jit(functools.partial(
            _locate_kernel, primary=self.primary, sa_intv=self.sa_intv))
        self._seed_jit = {}

    def seed_reads(self, codes: np.ndarray, rlens: np.ndarray):
        """Batched reference seeding scan (IdentifySeedPairs jump
        semantics) as a device automaton: one lane per read. Returns
        (n_seeds (R,), rpos/length/k0/freq (R, S)) int32/int64."""
        R, L = codes.shape
        Rp = self._pad_up(R, 1024)
        Lp = max(32, -(-L // 32) * 32)
        S = Lp // 16 + 2
        cp = np.full((Rp, Lp), 4, dtype=np.uint8)
        cp[:R, :L] = codes
        rl = np.zeros(Rp, dtype=np.int32)
        rl[:R] = rlens
        key = (Rp, Lp)
        if key not in self._seed_jit:
            self._seed_jit[key] = jax.jit(functools.partial(
                _seed_scan_kernel, primary=self.primary,
                max_dup=self.max_dup_num, max_seeds=S))
        n, rpos, length, k0, freq = self._seed_jit[key](
            self.blocks, self.L2, jnp.asarray(cp), jnp.asarray(rl))
        return (np.asarray(n[:R]), np.asarray(rpos[:R]),
                np.asarray(length[:R]), np.asarray(k0[:R]),
                np.asarray(freq[:R]))

    @staticmethod
    def _pad_up(n: int, quantum: int = 4096) -> int:
        return max(quantum, (n + quantum - 1) // quantum * quantum)

    def mem_walks(self, chars: np.ndarray, valid: np.ndarray):
        W, L = chars.shape
        # pad batch and length to buckets to bound jit recompilation
        Wp = self._pad_up(W)
        Lp = max(8, -(-L // 32) * 32)
        cp = np.full((Wp, Lp), 4, dtype=np.uint8)
        vp = np.zeros((Wp, Lp), dtype=bool)
        cp[:W, :L] = chars
        vp[:W, :L] = valid
        lens, x0, x2 = self._walk_jit(self.blocks, self.L2,
                                      jnp.asarray(cp), jnp.asarray(vp))
        return (np.asarray(lens[:W], dtype=np.int64),
                np.asarray(x0[:W], dtype=np.int64),
                np.asarray(x2[:W], dtype=np.int64))

    def locate(self, rows: np.ndarray) -> np.ndarray:
        n = rows.shape[0]
        if n == 0:
            return np.empty(0, dtype=np.int64)
        npad = self._pad_up(n)
        rp = np.zeros(npad, dtype=np.int32)
        rp[:n] = rows
        out = self._locate_jit(self.blocks, self.L2, self.sa_samples,
                               jnp.asarray(rp))
        return np.asarray(out[:n], dtype=np.int64)


# ---------------- kernels (pure jax; jitted above) ----------------


def _popcount2(x):
    """Number of set bits in a uint32, SWAR."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _count_base_in_words(words, c, take):
    """Occurrences of 2-bit base c within the first `take` bases of a
    4-word (64-base) group. words: (..., 4) uint32; take: (...,) int32
    in [0, 64]."""
    lane = jnp.arange(4, dtype=jnp.int32)  # word index
    take_w = jnp.clip(take[..., None] - lane * 16, 0, 16)  # bases per word
    # mask keeps the first take_w bases (top bits first); clamp the
    # shift to stay defined, then zero the take_w == 0 case explicitly
    shift = jnp.minimum((16 - take_w) * 2, 31)
    full = jnp.uint32(0xFFFFFFFF)
    mask = jnp.where(take_w == 0, jnp.uint32(0),
                     full << shift.astype(jnp.uint32))
    wm = words & mask
    # match lanes equal to c: y = ((c&2)? w : ~w)>>1 & ((c&1)? w : ~w) & 0x5555...
    hi = jnp.where((c & 2) != 0, wm, ~wm)
    lo = jnp.where((c & 1) != 0, wm, ~wm)
    y = (hi >> 1) & lo & jnp.uint32(0x55555555)
    cnt = _popcount2(y).astype(jnp.int32).sum(axis=-1)
    # masked-out lanes read as base 0; correct when counting c == 0
    pad = 64 - take
    cnt = jnp.where(c == 0, cnt - pad, cnt)
    return cnt


def _occ4(blocks, k, primary):
    """Occ(k, c) for c in 0..3; k int32 (…,). k == -1 -> zeros.
    (bwt_occ4 semantics, bwt_search.cpp:67-84)."""
    kk = k - (k >= primary).astype(jnp.int32)
    kk_safe = jnp.maximum(kk, 0)
    block = kk_safe >> 6
    take = (kk_safe & 63) + 1
    row = blocks[block]                       # (..., 8) uint32
    base_counts = row[..., :4].astype(jnp.int32)
    words = row[..., 4:8]
    cs = jnp.arange(4, dtype=jnp.int32)
    incr = jnp.stack(
        [_count_base_in_words(words, c, take) for c in range(4)], axis=-1)
    del cs
    res = base_counts + incr
    return jnp.where((k == -1)[..., None], 0, res)


def _bwt_char(blocks, x):
    """BWT code at stored position x (bwt_B0)."""
    row = blocks[x >> 6]
    word = jnp.take_along_axis(row, (4 + ((x >> 4) & 3))[..., None], axis=-1)[..., 0]
    shift = ((~x & 15) << 1).astype(jnp.uint32)
    return ((word >> shift) & 3).astype(jnp.int32)


def _mem_walks_kernel(blocks, L2, chars, valid, *, primary):
    """Batched forward-MEM walks (BWT_Search semantics). chars (W, L)
    uint8; returns (lens, x0, x2) int32."""
    W, L = chars.shape
    c0 = jnp.minimum(chars[:, 0].astype(jnp.int32), 3)
    x0 = L2[c0] + 1
    x1 = L2[3 - c0] + 1
    x2 = L2[c0 + 1] - L2[c0]
    started = valid[:, 0] & (chars[:, 0] <= 3)
    lens = jnp.where(started, 1, 0).astype(jnp.int32)

    def step(carry, inp):
        x0, x1, x2, lens, active = carry
        ch, ok = inp
        ch = ch.astype(jnp.int32)
        live = active & ok & (ch <= 3)
        tk = _occ4(blocks, x1 - 1, primary)
        tl = _occ4(blocks, x1 - 1 + x2, primary)
        widths = tl - tk                      # (W, 4)
        new_x1 = L2[:4][None, :] + 1 + tk
        adj = ((x1 <= primary) & (x1 + x2 - 1 >= primary)).astype(jnp.int32)
        s3 = x0 + adj
        s2 = s3 + widths[:, 3]
        s1 = s2 + widths[:, 2]
        s0 = s1 + widths[:, 1]
        starts = jnp.stack([s0, s1, s2, s3], axis=1)
        ci = 3 - ch
        rows = jnp.arange(W)
        w = widths[rows, ci]
        upd = live & (w > 0)
        x0 = jnp.where(upd, starts[rows, ci], x0)
        x1 = jnp.where(upd, new_x1[rows, ci], x1)
        x2 = jnp.where(upd, w, x2)
        lens = jnp.where(upd, lens + 1, lens)
        return (x0, x1, x2, lens, upd), None

    init = (x0, x1, x2, lens, started)
    (x0, x1, x2, lens, _), _ = jax.lax.scan(
        step, init, (chars[:, 1:].T, valid[:, 1:].T))
    return lens, x0, x2


def _seed_scan_kernel(blocks, L2, codes, rlens, *, primary, max_dup, max_seeds):
    """Device automaton replaying the reference seeding scan
    (IdentifySeedPairs, AlignmentCandidates.cpp:188-211): one lane per
    read; each iteration either (re)initializes the bidirectional
    interval at the current scan position or consumes one read char via
    backward search. Accepted MEMs (len >= 16, occ <= max_dup) are
    emitted and the scan jumps past them; otherwise it advances by one.

    Work per read is ~2x read length occ4 queries — the same count the
    reference performs — instead of walking from every position.
    """
    R, L = codes.shape
    S = max_seeds
    rows = jnp.arange(R, dtype=jnp.int32)

    end_pos = jnp.maximum(rlens - 13, 0)
    pos = jnp.zeros(R, jnp.int32)
    cur = jnp.zeros(R, jnp.int32)   # cur == pos -> interval not initialized
    x0 = jnp.zeros(R, jnp.int32)
    x1 = jnp.zeros(R, jnp.int32)
    x2 = jnp.zeros(R, jnp.int32)
    nseeds = jnp.zeros(R, jnp.int32)
    done = pos >= end_pos
    # outputs as (S, R): emitted via masked selects (XLA scatter on TPU
    # serializes; a one-hot select over <= S slots is pure VPU work)
    out_rpos = jnp.zeros((S, R), jnp.int32)
    out_len = jnp.zeros((S, R), jnp.int32)
    out_k0 = jnp.zeros((S, R), jnp.int32)
    out_freq = jnp.zeros((S, R), jnp.int32)
    slot_ids = jnp.arange(S, dtype=jnp.int32)[:, None]

    def char_at(idx):
        safe = jnp.clip(idx, 0, L - 1)
        return jnp.take_along_axis(codes, safe[:, None], axis=1)[:, 0].astype(jnp.int32)

    def cond(st):
        return jnp.any(~st[0])

    def body(st):
        (done, pos, cur, x0, x1, x2, nseeds,
         out_rpos, out_len, out_k0, out_freq) = st

        initing = (~done) & (cur == pos)
        extending = (~done) & (cur > pos)

        # ---- init branch ----
        c_pos = char_at(pos)
        amb = c_pos > 3
        c_safe = jnp.minimum(c_pos, 3)
        i_x0 = L2[c_safe] + 1
        i_x1 = L2[3 - c_safe] + 1
        i_x2 = L2[c_safe + 1] - L2[c_safe]

        # ---- extend branch (occ on current interval) ----
        ch = jnp.where(cur < rlens, char_at(cur), 4)
        q1 = jnp.where(extending, x1 - 1, 0)
        q2 = jnp.where(extending, x1 - 1 + x2, 0)
        tk = _occ4(blocks, q1, primary)
        tl = _occ4(blocks, q2, primary)
        widths = tl - tk
        new_x1s = L2[:4][None, :] + 1 + tk
        adj = ((x1 <= primary) & (x1 + x2 - 1 >= primary)).astype(jnp.int32)
        s3 = x0 + adj
        s2 = s3 + widths[:, 3]
        s1 = s2 + widths[:, 2]
        s0 = s1 + widths[:, 1]
        starts = jnp.stack([s0, s1, s2, s3], axis=1)
        ci = 3 - jnp.minimum(ch, 3)
        w = widths[rows, ci]
        can_extend = extending & (ch <= 3) & (w > 0)
        seed_end = extending & ~can_extend

        # ---- seed end: accept/emit/jump ----
        length = cur - pos
        acc = seed_end & (x2 <= max_dup) & (length >= 16)
        hit = acc[None, :] & (slot_ids == nseeds[None, :])  # (S, R)
        out_rpos = jnp.where(hit, pos[None, :], out_rpos)
        out_len = jnp.where(hit, length[None, :], out_len)
        out_k0 = jnp.where(hit, x0[None, :], out_k0)
        out_freq = jnp.where(hit, x2[None, :], out_freq)
        nseeds = jnp.where(acc, nseeds + 1, nseeds)

        # ---- state update ----
        new_pos = jnp.where(seed_end, jnp.where(acc, pos + length, pos + 1),
                            jnp.where(initing & amb, pos + 1, pos))
        new_cur = jnp.where(can_extend, cur + 1,
                            jnp.where(initing & ~amb, cur + 1, new_pos))
        x0 = jnp.where(can_extend, starts[rows, ci], jnp.where(initing & ~amb, i_x0, x0))
        x1 = jnp.where(can_extend, new_x1s[rows, ci], jnp.where(initing & ~amb, i_x1, x1))
        x2 = jnp.where(can_extend, w, jnp.where(initing & ~amb, i_x2, x2))
        done = done | (new_pos >= end_pos)
        return (done, new_pos, new_cur, x0, x1, x2, nseeds,
                out_rpos, out_len, out_k0, out_freq)

    st = (done, pos, cur, x0, x1, x2, nseeds,
          out_rpos, out_len, out_k0, out_freq)
    st = jax.lax.while_loop(cond, body, st)
    (_, _, _, _, _, _, nseeds, out_rpos, out_len, out_k0, out_freq) = st
    return nseeds, out_rpos.T, out_len.T, out_k0.T, out_freq.T


def _occ_c(blocks, k, c, primary, seq_len_unused=None):
    """bwt_occ(k, c): select base c from occ4."""
    full = _occ4(blocks, k, primary)
    return jnp.take_along_axis(full, c[..., None], axis=-1)[..., 0]


def _locate_kernel(blocks, L2, sa_samples, k, *, primary, sa_intv):
    """Batched bwt_sa: LF-walk each row until it hits a sampled row
    (row index % intv == 0), then add the sample
    (bwt_search.cpp:127-137). Walk length is unbounded (mean ~intv),
    so this is a while_loop over the whole batch with per-lane masks."""
    steps = jnp.zeros_like(k)
    mask = sa_intv - 1

    def cond(carry):
        k, _ = carry
        return jnp.any((k & mask) != 0)

    def body(carry):
        k, steps = carry
        active = (k & mask) != 0
        x = k - (k > primary).astype(jnp.int32)
        c = _bwt_char(blocks, x)
        nxt = L2[c] + _occ_c(blocks, k, c, primary)
        nxt = jnp.where(k == primary, 0, nxt)
        k2 = jnp.where(active, nxt, k)
        steps2 = jnp.where(active, steps + 1, steps)
        return (k2, steps2)

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return steps + sa_samples[k // sa_intv]
