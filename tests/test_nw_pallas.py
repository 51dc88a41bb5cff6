"""Pallas NW kernel vs the native/NumPy reference DP (bit-identical
gapped strings). Runs in interpreter mode so CI needs no TPU.

Status of the kernel (measured 2026-08-16): it is NOT on the
production hot path, by benchmark. The gap-closing DPs
(best_gapped_partition's two per intron gap plus the seed-pair fills,
native/pipeline.cpp:437-512,840-895) cost 5-93 us/call in host C++
(20x20..96x96, see the micro-bench in the repo log), totalling well
under the ~0.2 s/100k-read native finalize stage — while one
host<->device round trip on this TPU relay costs ~35 ms each way
before kernel time. Batching the chunk's DPs through the device would
spend more on transport than the entire host stage costs, so the host
DP wins on this transport; the Pallas kernel is kept as the TPU-native
implementation (and correctness twin) for transports where the device
is local."""

import random

import pytest

from dart_tpu.ops.nw_numpy import nw_align
from dart_tpu.ops.nw_pallas import nw_align_batch


def _fuzz_pairs(seed, n):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        m = rng.randrange(1, 127)
        k = rng.randrange(1, 127)
        alpha = "ACGTN" if rng.random() < 0.1 else "ACGTacgt"
        s1 = "".join(rng.choice(alpha) for _ in range(m)).encode()
        if rng.random() < 0.5:
            s2 = bytearray((s1 * 3)[:k])
            for _ in range(rng.randrange(0, 6)):
                s2[rng.randrange(0, len(s2))] = ord(rng.choice("ACGT"))
            s2 = bytes(s2)
        else:
            s2 = "".join(rng.choice(alpha) for _ in range(k)).encode()
        pairs.append((s1, s2))
    return pairs


def test_nw_pallas_matches_reference_dp():
    pairs = _fuzz_pairs(20260816, 32)
    got = nw_align_batch(pairs, interpret=True)
    for (s1, s2), (a1, a2) in zip(pairs, got):
        e1, e2 = nw_align(s1, s2)
        assert (a1, a2) == (e1, e2), (s1, s2)


def test_nw_pallas_rejects_oversize():
    with pytest.raises(ValueError):
        nw_align_batch([(b"A" * 128, b"C")], interpret=True)


@pytest.mark.skipif("DART_TPU_REAL_NW" not in __import__("os").environ,
                    reason="compiles on the real TPU via the relay "
                           "(30-180 s remote compile); set "
                           "DART_TPU_REAL_NW=1")
def test_nw_pallas_compiles_on_hardware():
    """The same kernel compiled + executed on the real chip (not
    interpret mode): the 'TPU-native twin' claim tested on hardware.
    Gated because the remote compile service is slow and
    tenant-shared; the result log is committed to
    tests/golden/nw_pallas_hw.log."""
    import jax

    assert jax.default_backend() != "cpu", (
        "DART_TPU_REAL_NW set but no accelerator backend present")
    pairs = _fuzz_pairs(20260817, 16)
    got = nw_align_batch(pairs, interpret=False)
    for (s1, s2), (a1, a2) in zip(pairs, got):
        e1, e2 = nw_align(s1, s2)
        assert (a1, a2) == (e1, e2), (s1, s2)
