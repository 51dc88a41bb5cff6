"""Unit tests for the compute primitives: FM-index search/locate vs
brute force, and the two NW implementations against each other (both
were fuzz-verified against the compiled reference DP; see
tools/build_reference.sh + the nw harness procedure in docs)."""

import numpy as np
import pytest

from dart_tpu.ops.fm_numpy import FMIndexNumpy
from dart_tpu.ops.nw_numpy import nw_align, nw_align_numpy


@pytest.fixture(scope="module")
def fm(toy_index):
    return FMIndexNumpy(toy_index)


def _brute_occurrences(text: bytes, pat: bytes):
    out = []
    s = 0
    while True:
        i = text.find(pat, s)
        if i < 0:
            return out
        out.append(i)
        s = i + 1


def test_mem_walks_vs_bruteforce(toy_index, fm):
    text = toy_index.ref_codes.tobytes()
    rng = np.random.default_rng(11)
    n = toy_index.seq_len
    for _ in range(30):
        pos = int(rng.integers(0, n - 120))
        q = bytearray(text[pos : pos + 100])
        for _ in range(int(rng.integers(0, 3))):
            i = int(rng.integers(0, len(q)))
            q[i] = (q[i] + 1 + int(rng.integers(0, 3))) % 4
        q = bytes(q)
        chars = np.frombuffer(q, dtype=np.uint8)[None, :]
        lens, k0, freq = fm.mem_walk_batch(chars, np.ones_like(chars, dtype=bool))
        ell = 0
        while ell < len(q) and text.find(q[: ell + 1]) >= 0:
            ell += 1
        assert lens[0] == ell
        assert freq[0] == len(_brute_occurrences(text, q[: int(lens[0])]))


def test_locate_vs_bruteforce(toy_index, fm):
    text = toy_index.ref_codes.tobytes()
    rng = np.random.default_rng(12)
    for _ in range(10):
        pos = int(rng.integers(0, toy_index.seq_len - 40))
        q = text[pos : pos + 24]
        chars = np.frombuffer(q, dtype=np.uint8)[None, :]
        lens, k0, freq = fm.mem_walk_batch(chars, np.ones_like(chars, dtype=bool))
        rows = np.arange(int(k0[0]), int(k0[0]) + int(freq[0]))
        locs = sorted(fm.locate(rows).tolist())
        assert locs == _brute_occurrences(text, q[: int(lens[0])])


def test_nw_implementations_agree():
    rng = np.random.default_rng(13)
    bases = b"ACGT"
    for trial in range(60):
        m = int(rng.integers(1, 70))
        n = int(rng.integers(1, 70))
        s1 = bytes(bases[i] for i in rng.integers(0, 4, m))
        s2 = bytes(bases[i] for i in rng.integers(0, 4, n))
        assert nw_align(s1, s2) == nw_align_numpy(s1, s2)


def test_nw_known_case():
    # AACCGG vs AACGG: the reference's overload quirk yields this exact
    # (sub-optimal-looking) alignment — guards the semantics.
    a1, a2 = nw_align(b"AACCGG", b"AACGG")
    assert (a1, a2) == (b"AACCGG", b"-AACGG")


def test_seed_scan_lut_equivalence(toy_index):
    """The K-mer LUT init path must produce byte-identical seed tables
    to the plain one-char init path (K=4 keeps the CPU build cheap)."""
    import numpy as np

    from dart_tpu.ops.fm_jax import FMIndexJax

    rng = np.random.default_rng(11)
    eng0 = FMIndexJax(toy_index, lut_k=0)
    eng4 = FMIndexJax(toy_index, lut_k=4)
    R, L = 64, 100
    codes = np.empty((R, L), dtype=np.uint8)
    rlens = np.full(R, L, dtype=np.int32)
    for i in range(R):
        p = int(rng.integers(0, toy_index.genome_size - L))
        codes[i] = toy_index.ref_codes[p : p + L]
    # sprinkle mismatches and ambiguity
    mut = rng.random((R, L)) < 0.03
    codes = np.where(mut, rng.integers(0, 5, (R, L)).astype(np.uint8), codes)
    a = eng0.seed_reads(codes, rlens)
    b = eng4.seed_reads(codes, rlens)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_unpack_seed_host_wide_rpos():
    """Non-half-word unpack must not sign-extend rpos >= 32768 or
    len/freq fields (reads up to 65535 bases take this path)."""
    import numpy as np

    from dart_tpu.ops.fm_jax import _unpack_seed_host

    S = 4
    host = np.zeros((2, 1 + 3 * S), dtype=np.int32)
    # read 0: one seed at rpos 40000, len 20, k0 7, freq 3
    host[0, 0] = (1 << 1) | 1
    host[0, 1] = np.uint32((40000 << 16) | 20).view(np.int32)
    host[0, 1 + S] = 7
    host[0, 1 + 2 * S] = 3
    fin = np.array([0])
    rp, ln, kk, fr = _unpack_seed_host(host, fin, S, packed_halves=False)
    assert rp[0, 0] == 40000 and ln[0, 0] == 20
    assert kk[0, 0] == 7 and fr[0, 0] == 3


def test_unpack_seed_host_packed_halves_roundtrip():
    import numpy as np

    from dart_tpu.ops.fm_jax import _unpack_seed_host

    S = 4
    rng = np.random.default_rng(0)
    rpos = rng.integers(0, 200, (3, S)).astype(np.int32)
    slen = rng.integers(16, 100, (3, S)).astype(np.int32)
    k0 = rng.integers(0, 2**31 - 1, (3, S)).astype(np.int32)
    freq = rng.integers(-1, 100, (3, S)).astype(np.int32)
    meta = (rpos << 8) | slen
    meta2 = (meta[:, 0::2] << 16) | meta[:, 1::2]
    fr = freq + 1
    fr2 = (fr[:, 0::2] << 16) | fr[:, 1::2]
    host = np.concatenate(
        [np.full((3, 1), 1, np.int32), meta2, k0, fr2], axis=1)
    rp, ln, kk, fq = _unpack_seed_host(host, np.arange(3), S, True)
    assert (rp == rpos).all() and (ln == slen).all()
    assert (kk == k0).all() and (fq == freq).all()


def test_pipelined_expansion_matches_full_tables(toy_index):
    """_expand_occurrences_pipelined (per-round locate dispatch) must
    produce identical occurrence tables to the full-table path, across
    straggler reruns and N-read rerouting."""
    import numpy as np

    from dart_tpu.ops.fm_jax import FMIndexJax
    from dart_tpu.pipeline import seeding

    eng = FMIndexJax(toy_index, lut_k=0)
    rng = np.random.default_rng(77)
    R, L = 64, 96
    codes = np.empty((R, L), dtype=np.uint8)
    for i in range(R):
        p = int(rng.integers(0, toy_index.genome_size - L))
        codes[i] = toy_index.ref_codes[p:p + L]
    mut = rng.random((R, L)) < 0.05
    codes = np.where(mut, rng.integers(0, 5, (R, L)).astype(np.uint8),
                     codes)
    codes[5, 30] = 4  # N-read reroute
    codes[11] = codes[11, :1]  # maximally repetitive -> straggler round
    rlens = np.full(R, L, dtype=np.int32)
    rlens[7] = 17

    def pack(codes, rlens):
        Lp = max(32, -(-L // 32) * 32)
        words = Lp // 16
        Rp = eng._pad_up(R, eng._min_bucket)
        cp = np.full((Rp, Lp), 4, dtype=np.uint8)
        cp[:R, :L] = codes
        rl = np.zeros(Rp, np.int32)
        rl[:R] = rlens
        in_read = np.arange(Lp)[None, :] < rl[:, None]
        c2 = np.where(in_read, np.minimum(cp, 3), 3).astype(np.uint32)
        buf = np.zeros((Rp, words + 1), dtype=np.uint32)
        nmask = np.zeros((Rp, words // 2), dtype=np.uint32)
        for k in range(16):
            buf[:, :words] |= c2[:, k::16] << np.uint32(2 * (15 - k))
        buf[:, words] = rl.view(np.uint32)
        isn = (cp > 3) & in_read
        for k in range(32):
            nmask |= isn[:, k::32].astype(np.uint32) << np.uint32(31 - k)
        has_n = isn.any(axis=1).astype(np.uint8)
        return buf, nmask, has_n, int(has_n.sum()), Lp

    buf, nmask, has_n, n_n, Lp = pack(codes, rlens)
    assert n_n >= 1
    job1 = eng.seed_submit_packed(buf.copy(), nmask, has_n, n_n, R, Lp, L)
    fired = []
    got = seeding._expand_occurrences_pipelined(
        eng, job1, R, on_wait=lambda: fired.append(1))
    assert fired == [1]
    job2 = eng.seed_submit_packed(buf.copy(), nmask, has_n, n_n, R, Lp, L)
    n, rp, ln, k0, fr = eng.seed_finish(job2)
    want = seeding._expand_occurrences(eng, n, rp, ln, k0, fr, R)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)
