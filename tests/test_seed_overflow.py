"""Round-1 slim-slot overflow reroute (ops/fm_jax.seed_slots_r1).

Round 1 of the seed scan ships a slimmer result table than the
worst-case slot count (measured p99.9 is 4 seeds per 100 bp read vs
the cap of 6); a lane that accepts MORE seeds than round 1's slots is
reported not-done and rerouted through the full-width straggler rerun
round. These reads — six spliced-together 16-mers from distant genome
positions, so each 16-mer seeds and junctions break extension — force
6 seeds per read and must come back bit-equal to the all-walks oracle
replay (reference scan semantics, AlignmentCandidates.cpp:188-211).
"""

import numpy as np


def _six_seed_reads(idx, n=48, seed=7):
    rng = np.random.default_rng(seed)
    codes = np.zeros((n, 96), np.uint8)
    for i in range(n):
        parts = []
        for _ in range(6):
            p = int(rng.integers(0, idx.genome_size - 20))
            parts.append(idx.ref_codes[p:p + 16])
        codes[i] = np.concatenate(parts)
    return np.minimum(codes, 3), np.full(n, 96, np.int32)


def test_overflow_lanes_reroute_bit_equal(toy_index):
    from dart_tpu.ops.fm_jax import FMIndexJax
    from dart_tpu.ops.fm_numpy import FMIndexNumpy
    from dart_tpu.pipeline.seeding import seed_reads_from_all_walks

    idx = toy_index
    fm = FMIndexJax(idx, lut_k=0)
    codes, lens = _six_seed_reads(idx)
    # the slim round-1 width must be below the worst case for this
    # shape, else the test exercises nothing
    s_full = fm.seed_slots(128, 96)
    assert fm.seed_slots_r1(s_full) < s_full
    n, rpos, slen, k0, freq = fm.seed_reads(codes, lens)
    assert int(n.max()) == 6, "reads must actually overflow round 1"
    assert int((n > fm.seed_slots_r1(s_full)).sum()) > 0

    class _Oracle:
        def __init__(self):
            self.fm = FMIndexNumpy(idx)

        def mem_walks(self, c, v):
            return self.fm.mem_walk_batch(c, v)

    n2, rp2, ln2, k02, fr2 = seed_reads_from_all_walks(
        _Oracle(), codes, lens, 100)
    np.testing.assert_array_equal(n, n2)
    for r in range(len(lens)):
        for j in range(int(n[r])):
            assert (int(rpos[r, j]), int(slen[r, j])) == \
                   (int(rp2[r, j]), int(ln2[r, j]))
            if int(freq[r, j]) >= 0:  # -1 = direct fast-extension seed
                assert int(freq[r, j]) == int(fr2[r, j])
                assert int(k0[r, j]) == int(k02[r, j])
