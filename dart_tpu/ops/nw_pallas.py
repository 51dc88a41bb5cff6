"""Batched gap-closing DP as a Pallas TPU kernel.

The reference's nw_alignment (nw_alignment.cpp:18-82) is the aligner's
third hot loop: an O(mn) global alignment run on every non-exact gap
segment. This kernel evaluates a whole batch of fragment pairs with an
anti-diagonal wavefront — the TPU-shaped formulation: cell (i, j) lives
at (d=i+j, i), so every dependency is a shifted row of the previous two
diagonals and the inner update is pure 128-lane VPU work with no
gather.

Scoring replicates the reference bit-for-bit, including its
overload-resolution quirk: the r/t gap updates use plain float max
while the 3-way s update truncates every argument toward zero
(max(short, short, short), nw_alignment.cpp:8-16). Traceback choices
(s==r -> gap in s1, else s==t -> gap in s2, else diagonal;
nw_alignment.cpp:61-74) are resolved during the forward pass against
the RAW r/t values — exactly the comparisons the reference's traceback
performs against its stored matrices — and returned as one byte per
cell; the sequential per-pair walk happens on the host.

Fragment pairs up to 127x127 (gap segments are bounded by read length;
longer fragments fall back to the native DP). One block = TB pairs;
direction planes are (TB, 2L+1, L+1) int8 with L+1 = 128 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NT4_TABLE

L = 127            # max fragment length per side
LANES = L + 1      # 128
D = 256            # diagonal planes (d = 0..2L used; padded to 8-align)
TB = 8             # pairs per block

OPEN_GAP = -1.0
EXTEND_GAP = -0.5
NEW_GAP = -1.5
MAXPEN = -65536.0


def _trunc(x):
    """float -> int truncation toward zero (the short() casts)."""
    return jnp.trunc(x)


def _nw_kernel(c1_ref, c2r_ref, mn_ref, dirs_ref):
    """One block of TB pairs. c1: (TB, LANES) int32 codes (pad 4);
    c2r: (TB, 3*LANES) with reversed s2 codes at [2*LANES - n, 2*LANES)
    so that c2r[:, 2*LANES - d + i] == c2[d - 1 - i]; mn: (TB, 2) int32
    lengths; dirs out: (TB, D/8, LANES) int32 — traceback choices,
    2 bits per diagonal, 8 diagonals per plane."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, LANES), 1)
    m = mn_ref[:, 0:1]
    n = mn_ref[:, 1:2]
    c1 = c1_ref[:]
    c2r = c2r_ref[:]

    neg = jnp.full((TB, LANES), MAXPEN, jnp.float32)
    # state entering diagonal 0: no previous diagonals exist
    s_pp = neg
    s_p = neg
    r_p = neg
    t_p = neg

    def step(d, carry):
        """Compute diagonal d (d >= 0); returns (new state, choices)."""
        s_pp, s_p, r_p, t_p = carry
        # shifted previous rows: index i-1 of diagonal d-1 / d-2
        s_p_im1 = jnp.concatenate([neg[:, :1], s_p[:, :-1]], axis=1)
        t_p_im1 = jnp.concatenate([neg[:, :1], t_p[:, :-1]], axis=1)
        s_pp_im1 = jnp.concatenate([neg[:, :1], s_pp[:, :-1]], axis=1)

        r_raw = jnp.maximum(r_p + EXTEND_GAP, s_p + NEW_GAP)
        t_raw = jnp.maximum(t_p_im1 + EXTEND_GAP, s_p_im1 + NEW_GAP)

        # match score for (i-1, j-1), j = d - i. Diagonal reads are
        # contiguous by construction: a static shift of c1 and a
        # d-dependent dynamic slice of the reversed-padded c2.
        a = jnp.concatenate([c1[:, :1], c1[:, :-1]], axis=1)
        # lane-dim dynamic slices must be 128-aligned on TPU; a dynamic
        # rotate + static slice reads the same diagonal window
        # out[i] = c2r[i + 2*LANES - d]: left-rotate by (2*LANES - d),
        # i.e. roll shift d - 2*LANES == d + LANES (mod 3*LANES)
        b = pltpu.roll(c2r, d + LANES, axis=1)[:, :LANES]
        # N == N (both code 4) matches, as in the reference's code
        # comparison; the pads (4 vs 5) never meet in a valid cell
        mt = jnp.where(a == b, jnp.float32(1.5), jnp.float32(-1.5))
        diag = _trunc(s_pp_im1 + mt)

        sv = jnp.maximum(diag, jnp.maximum(_trunc(r_raw), _trunc(t_raw)))
        choice = jnp.where(sv == r_raw, 1,
                           jnp.where(sv == t_raw, 2, 0)).astype(jnp.int32)

        # boundary cells of this diagonal; diagonal 0 is the origin cell
        df = d.astype(jnp.float32) if hasattr(d, "astype") else jnp.float32(d)
        edge = jnp.where(d == 0, 0.0,
                         jnp.float32(OPEN_GAP) + df * jnp.float32(EXTEND_GAP))
        top = lane == 0                     # (0, d)
        left = lane == d                    # (d, 0)
        s_new = jnp.where(top | left, edge, sv)
        r_new = jnp.where(top, edge, jnp.where(left, MAXPEN, r_raw))
        t_new = jnp.where(left, edge, jnp.where(top, MAXPEN, t_raw))
        choice = jnp.where(top, 1, jnp.where(left, 2, choice))

        # cells outside this pair's (m+1)x(n+1) matrix are inert
        valid = (lane <= jnp.minimum(d, m)) & (d - lane <= n)
        s_new = jnp.where(valid, s_new, MAXPEN)
        choice = jnp.where(valid, choice, 0)
        return (s_p, s_new, r_new, t_new), choice

    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, D // 8, LANES), 1)
    packed0 = jnp.zeros((TB, D // 8, LANES), jnp.int32)

    def blk_body(blk, carry):
        # pack 8 diagonals' 2-bit choices into one int32 plane held in
        # the loop carry (dynamic sublane stores need 8-alignment and
        # int8 relayouts are unsupported; one static store at the end)
        st, packed = carry
        bits = jnp.zeros((TB, LANES), jnp.int32)
        for k in range(8):
            d = blk * 8 + k
            st, choice = step(d, st)
            bits = bits | (choice << (2 * k))
        packed = jnp.where(blk_iota == blk, bits[:, None, :], packed)
        return (st, packed)

    (_, packed) = jax.lax.fori_loop(
        0, D // 8, blk_body, ((s_pp, s_p, r_p, t_p), packed0))
    dirs_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nw_batch_device(c1, c2r, mn, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = c1.shape[0]
    grid = (B // TB,)
    return pl.pallas_call(
        _nw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, LANES), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((TB, 3 * LANES), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((TB, 2), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, D // 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D // 8, LANES), jnp.int32),
        interpret=interpret,
    )(c1, c2r, mn)


def _traceback(packed: np.ndarray, s1: bytes, s2: bytes) -> tuple[bytes, bytes]:
    """Host walk over the packed choice planes (nw_alignment.cpp:61-74);
    choice(d, i) sits in bits [2*(d%8), +2) of packed[d//8, i]."""
    i, j = len(s1), len(s2)
    o1 = bytearray()
    o2 = bytearray()
    while i > 0 or j > 0:
        d = i + j
        c = (packed[d >> 3, i] >> (2 * (d & 7))) & 3
        if c == 1:
            o1.append(ord("-"))
            o2.append(s2[j - 1])
            j -= 1
        elif c == 2:
            o1.append(s1[i - 1])
            o2.append(ord("-"))
            i -= 1
        else:
            o1.append(s1[i - 1])
            o2.append(s2[j - 1])
            i -= 1
            j -= 1
    o1.reverse()
    o2.reverse()
    return bytes(o1), bytes(o2)


def nw_align_batch(pairs: list[tuple[bytes, bytes]],
                   interpret: bool = False) -> list[tuple[bytes, bytes]]:
    """Align a batch of fragment pairs on device; every pair must have
    both sides <= 127 bases. Results are bit-identical to ops/nw_numpy
    (and to the reference DP, fuzz-verified)."""
    B = len(pairs)
    if B == 0:
        return []
    Bp = -(-B // TB) * TB
    c1 = np.full((Bp, LANES), 4, np.int32)
    c2r = np.full((Bp, 3 * LANES), 5, np.int32)  # 5 never matches c1's pad
    mn = np.zeros((Bp, 2), np.int32)
    for k, (s1, s2) in enumerate(pairs):
        if len(s1) > L or len(s2) > L:
            raise ValueError("fragment longer than 127 bases")
        # kernel reads c1[lane-1] -> codes of s1 at [0, len)
        c1[k, :len(s1)] = NT4_TABLE[np.frombuffer(s1, np.uint8)]
        # kernel slices c2r at [2*LANES - d, +LANES): reversed codes
        # live at [2*LANES - len, 2*LANES)
        b = NT4_TABLE[np.frombuffer(s2, np.uint8)]
        c2r[k, 2 * LANES - len(s2):2 * LANES] = b[::-1]
        mn[k] = (len(s1), len(s2))
    dirs = np.asarray(_nw_batch_device(jnp.asarray(c1), jnp.asarray(c2r),
                                       jnp.asarray(mn), interpret=interpret))
    return [_traceback(dirs[k], s1, s2) for k, (s1, s2) in enumerate(pairs)]
