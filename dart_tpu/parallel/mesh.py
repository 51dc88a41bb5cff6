"""Multi-chip execution: device meshes and sharded FM-index kernels.

Two sharding axes (the aligner analogues of dp/tp):
- "data": read batches (walk tasks / locate rows) shard across chips —
  the throughput axis; reads are embarrassingly parallel
  (the reference's pthread chunk pool, Mapping.cpp:16,591-595, scaled
  to chips).
- "index": the FM-index block table shards by row range across chips
  (for genomes whose index exceeds one chip's HBM). Each Occ query row
  is answered by its owning shard and combined with a psum over ICI —
  the tensor-parallel analogue.

With index_shards == 1 the index is replicated and no collective runs
on the query path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.loader import Index
from ..ops.fm_jax import BLOCK, build_device_layout


def make_mesh(n_devices: int | None = None, index_shards: int = 1,
              backend: str | None = None) -> Mesh:
    devs = jax.devices(backend)
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices and backend is None:
        # fall back to the (possibly virtualized) CPU backend — e.g. under
        # --xla_force_host_platform_device_count for multi-chip dry runs
        devs = jax.devices("cpu")
    data = n_devices // index_shards
    grid = np.asarray(devs[:n_devices]).reshape(data, index_shards)
    return Mesh(grid, ("data", "index"))


# ---- sharded occ/walk/locate (shard_map bodies) ----


def _popcount2(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _count_base_in_words(words, c, take):
    lane = jnp.arange(4, dtype=jnp.int32)
    take_w = jnp.clip(take[..., None] - lane * 16, 0, 16)
    shift = jnp.minimum((16 - take_w) * 2, 31)
    full = jnp.uint32(0xFFFFFFFF)
    mask = jnp.where(take_w == 0, jnp.uint32(0), full << shift.astype(jnp.uint32))
    wm = words & mask
    hi = jnp.where((c & 2) != 0, wm, ~wm)
    lo = jnp.where((c & 1) != 0, wm, ~wm)
    y = (hi >> 1) & lo & jnp.uint32(0x55555555)
    cnt = _popcount2(y).astype(jnp.int32).sum(axis=-1)
    return jnp.where(c == 0, cnt - (64 - take), cnt)


def _gather_block_rows(blocks_local, block_idx, n_blocks_per_shard, index_axis):
    """Fetch (…, 8) uint32 block rows from the owning index shard.
    With one shard this is a plain gather; with more, non-owners
    contribute zeros and a psum over the index axis assembles rows."""
    if index_axis is None:
        return blocks_local[block_idx]
    my = jax.lax.axis_index(index_axis)
    owner = block_idx // n_blocks_per_shard
    local = jnp.clip(block_idx - my * n_blocks_per_shard, 0, blocks_local.shape[0] - 1)
    rows = blocks_local[local]
    rows = jnp.where((owner == my)[..., None], rows, jnp.uint32(0))
    return jax.lax.psum(rows, index_axis)


def _occ4_sharded(blocks_local, k, primary, nbps, index_axis):
    kk = k - (k >= primary).astype(jnp.int32)
    kk_safe = jnp.maximum(kk, 0)
    row = _gather_block_rows(blocks_local, kk_safe >> 6, nbps, index_axis)
    take = (kk_safe & 63) + 1
    base_counts = row[..., :4].astype(jnp.int32)
    words = row[..., 4:8]
    incr = jnp.stack([_count_base_in_words(words, c, take) for c in range(4)], axis=-1)
    res = base_counts + incr
    return jnp.where((k == -1)[..., None], 0, res)


def _walks_body(blocks_local, L2, chars, valid, *, primary, nbps, index_axis):
    W = chars.shape[0]
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
        tk = _occ4_sharded(blocks_local, x1 - 1, primary, nbps, index_axis)
        tl = _occ4_sharded(blocks_local, x1 - 1 + x2, primary, nbps, index_axis)
        widths = tl - tk
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

    (x0, x1, x2, lens, _), _ = jax.lax.scan(
        step, (x0, x1, x2, lens, started), (chars[:, 1:].T, valid[:, 1:].T))
    return lens, x0, x2


def _locate_body(blocks_local, L2, sa_samples, k, *, primary, sa_intv, nbps, index_axis):
    steps = jnp.zeros_like(k)
    mask = sa_intv - 1

    def bwt_char(x):
        row = _gather_block_rows(blocks_local, x >> 6, nbps, index_axis)
        word = jnp.take_along_axis(row, (4 + ((x >> 4) & 3))[..., None], axis=-1)[..., 0]
        shift = ((~x & 15) << 1).astype(jnp.uint32)
        return ((word >> shift) & 3).astype(jnp.int32)

    def cond(carry):
        k, _ = carry
        flag = jnp.any((k & mask) != 0)
        if index_axis is not None:
            # keep index-shard peers in lockstep (their psums must pair up)
            flag = jax.lax.pmax(flag, index_axis)
        return flag

    def body(carry):
        k, steps = carry
        active = (k & mask) != 0
        x = k - (k > primary).astype(jnp.int32)
        c = bwt_char(x)
        full = _occ4_sharded(blocks_local, k, primary, nbps, index_axis)
        occ = jnp.take_along_axis(full, c[..., None], axis=-1)[..., 0]
        nxt = jnp.where(k == primary, 0, L2[c] + occ)
        return (jnp.where(active, nxt, k), jnp.where(active, steps + 1, steps))

    k, steps = jax.lax.while_loop(cond, body, (k, steps))
    return steps + sa_samples[k // sa_intv]


class ShardedFMIndex:
    """FM-index engine running walks/locates over a (data, index) mesh.

    Drop-in for the single-device engine: mem_walks / locate take and
    return host NumPy arrays; device placement and collectives are
    internal.
    """

    def __init__(self, idx: Index, mesh: Mesh, max_dup_num: int = 100):
        self.mesh = mesh
        self.primary = int(idx.primary)
        self.sa_intv = int(idx.sa_intv)
        self.max_dup_num = max_dup_num
        n_index = mesh.shape["index"]
        blocks = build_device_layout(idx)
        n_blocks = blocks.shape[0]
        nbps = -(-n_blocks // n_index)
        if n_blocks < nbps * n_index:
            blocks = np.concatenate(
                [blocks, np.zeros((nbps * n_index - n_blocks, 8), np.uint32)])
        self.nbps = nbps
        self.index_axis = "index" if n_index > 1 else None
        # replicated index: the full single-chip automaton runs
        # data-parallel via GSPMD (its while_loop partitions cleanly —
        # per-lane state is batch-sharded, gathers hit replicated
        # tables), so seeding and locates get the fast kernels
        self._fast = None
        if self.index_axis is None:
            from ..ops.fm_jax import FMIndexJax

            self._fast = FMIndexJax(idx, max_dup_num=max_dup_num,
                                    data_mesh=mesh)

        spec_blocks = P("index", None) if n_index > 1 else P(None, None)
        self.blocks = jax.device_put(blocks, NamedSharding(mesh, spec_blocks))
        self.L2 = jax.device_put(idx.L2.astype(np.int32), NamedSharding(mesh, P()))
        self.sa_samples = jax.device_put(
            idx.sa_samples.astype(np.int32), NamedSharding(mesh, P()))

        from jax.experimental.shard_map import shard_map

        walk_body = functools.partial(
            _walks_body, primary=self.primary, nbps=nbps, index_axis=self.index_axis)
        locate_body = functools.partial(
            _locate_body, primary=self.primary, sa_intv=self.sa_intv,
            nbps=nbps, index_axis=self.index_axis)
        in_specs_w = (spec_blocks, P(), P("data", None), P("data", None))
        out_specs_w = (P("data"), P("data"), P("data"))
        self._walks = jax.jit(shard_map(
            walk_body, mesh=mesh, in_specs=in_specs_w, out_specs=out_specs_w,
            check_rep=False))
        in_specs_l = (spec_blocks, P(), P(), P("data"))
        self._locate = jax.jit(shard_map(
            locate_body, mesh=mesh, in_specs=in_specs_l, out_specs=P("data"),
            check_rep=False))
        self.data_shards = mesh.shape["data"]

    def _pad_up(self, n: int) -> int:
        q = 1024 * self.data_shards
        return max(q, -(-n // q) * q)

    def mem_walks(self, chars: np.ndarray, valid: np.ndarray):
        W, L = chars.shape
        Wp = self._pad_up(W)
        Lp = max(8, -(-L // 32) * 32)
        cp = np.full((Wp, Lp), 4, dtype=np.uint8)
        vp = np.zeros((Wp, Lp), dtype=bool)
        cp[:W, :L] = chars
        vp[:W, :L] = valid
        lens, x0, x2 = self._walks(self.blocks, self.L2, cp, vp)
        return (np.asarray(lens[:W], dtype=np.int64),
                np.asarray(x0[:W], dtype=np.int64),
                np.asarray(x2[:W], dtype=np.int64))

    def locate(self, rows: np.ndarray) -> np.ndarray:
        if self._fast is not None:
            return self._fast.locate(rows)
        n = rows.shape[0]
        if n == 0:
            return np.empty(0, dtype=np.int64)
        npad = self._pad_up(n)
        rp = np.zeros(npad, dtype=np.int32)
        rp[:n] = rows
        out = self._locate(self.blocks, self.L2, self.sa_samples, rp)
        return np.asarray(out[:n], dtype=np.int64)

    def seed_reads(self, codes: np.ndarray, rlens: np.ndarray):
        if self._fast is not None:
            return self._fast.seed_reads(codes, rlens)
        from ..pipeline.seeding import seed_reads_from_all_walks

        return seed_reads_from_all_walks(self, codes, rlens, self.max_dup_num)
