"""Index builder + loader tests: byte parity with the reference
`bwt_index` output (committed under tests/golden/index) and
self-consistency of the loaded structures."""

import numpy as np
import pytest

from dart_tpu.index import builder, load_index, packer
from dart_tpu.index.suffix_array import _sa_numpy, suffix_array


def test_build_byte_parity(tmp_path, data_dir, golden_dir):
    prefix = tmp_path / "toy"
    builder.build_index(str(data_dir / "toy.fa"), str(prefix))
    for ext in [".bwt", ".sa", ".pac", ".ann", ".amb"]:
        ours = (prefix.parent / ("toy" + ext)).read_bytes()
        golden = (golden_dir / "index" / ("toy" + ext)).read_bytes()
        assert ours == golden, f"{ext} differs from reference bwt_index output"


def test_sais_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 100, 1000]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sa_native = suffix_array(codes)
        sa_np = _sa_numpy(codes)
        np.testing.assert_array_equal(sa_native, sa_np)


def test_sais_is_valid_suffix_order():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 500).astype(np.uint8)
    sa = suffix_array(codes)
    s = bytes(codes)
    suffixes = sorted(range(len(s)), key=lambda i: s[i:])
    np.testing.assert_array_equal(sa, suffixes)


def test_loader_roundtrip(golden_dir):
    idx = load_index(str(golden_dir / "index" / "toy"))
    assert idx.genome_size == 100000
    assert idx.seq_len == 200000
    assert [c.name for c in idx.chromosomes] == ["chrA", "chrB"]
    assert idx.chromosomes[0].length == 60000
    # RefSequence convention: second half is the reverse complement.
    rc = (3 - idx.ref_codes[: idx.genome_size][::-1]) % 4
    np.testing.assert_array_equal(idx.ref_codes[idx.genome_size :], rc)
    # Occ checkpoints: final row equals total counts = diffs of L2.
    np.testing.assert_array_equal(idx.occ[-1], np.diff(idx.L2))
    # BWT sanity: character counts equal text counts.
    np.testing.assert_array_equal(np.bincount(idx.bwt, minlength=4), np.diff(idx.L2))


def test_lrand48_sequence():
    # First values of lrand48 after srand48(11), validated against glibc.
    r = packer.Lrand48(11)
    vals = [r.next() for _ in range(4)]
    # Validated against glibc indirectly via the byte-identical .pac test.
    assert vals == [1609868485, 1074594562, 470884846, 2128573038]


def test_pac_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for n in [1, 3, 4, 5, 1023, 1024]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        p = tmp_path / f"t{n}.pac"
        packer.write_pac(str(p), codes)
        back = packer.read_pac(str(p))
        np.testing.assert_array_equal(back, codes)


def test_native_deinterleave_matches_numpy(toy_index, golden_dir):
    """layout.cpp's single-pass .bwt splitter must equal the NumPy
    twin (the native path serves >2^31-element genomes)."""
    import numpy as np

    from dart_tpu.index import loader
    from dart_tpu.native import build as native_build

    assert hasattr(native_build.load(), "dart_deinterleave_bwt")
    with open(str(golden_dir / "index" / "toy.bwt"), "rb") as f:
        data = f.read()
    header = np.frombuffer(data[:40], dtype="<u8")
    seq_len = int(header[4])
    payload = np.frombuffer(data[40:], dtype="<u4")
    got_c, got_o = loader.deinterleave_bwt(payload, seq_len)

    # force the numpy twin by monkeypatching the native loader away
    orig = native_build.load
    native_build.load = lambda: None
    try:
        want_c, want_o = loader.deinterleave_bwt(payload, seq_len)
    finally:
        native_build.load = orig
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_o, want_o)


def test_native_wide_layout_matches_numpy(toy_index):
    import numpy as np

    from dart_tpu.native import build as native_build
    from dart_tpu.ops import fm_jax_wide

    got = fm_jax_wide.build_device_layout_wide(toy_index)
    orig = native_build.load
    native_build.load = lambda: None
    try:
        want = fm_jax_wide.build_device_layout_wide(toy_index)
    finally:
        native_build.load = orig
    np.testing.assert_array_equal(got, want)


def test_native_ref_from_pac_matches_numpy(tmp_path):
    """The native one-pass pac -> (codes, ascii) derivation is
    bit-identical to the NumPy fallback at every l_pac % 4."""
    import numpy as np

    from dart_tpu.index import loader, packer
    from dart_tpu.native import build as native_build

    assert hasattr(native_build.load(), "dart_ref_from_pac")
    rng = np.random.default_rng(7)
    for n in (257, 258, 259, 260):
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        path = str(tmp_path / f"t{n}.pac")
        packer.write_pac(path, codes)
        got_c, got_a, got_p = loader._derive_ref(path, n)
        orig = native_build.load
        native_build.load = lambda: None
        try:
            want_c, want_a, want_p = loader._derive_ref(path, n)
        finally:
            native_build.load = orig
        np.testing.assert_array_equal(got_c, want_c)
        np.testing.assert_array_equal(got_a, want_a)
        for p, a in ((got_p, got_a), (want_p, want_a)):
            assert p.shape[0] == a.shape[0] + 2 * loader.REF_GUARD
            assert (p[:loader.REF_GUARD] == ord("N")).all()
            assert (p[-loader.REF_GUARD:] == ord("N")).all()
            assert np.shares_memory(a, p)
