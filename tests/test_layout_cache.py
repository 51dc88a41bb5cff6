"""Disk-backed layout cache: cache-hit loads must be bit-identical to
derive-path loads, and the lazy Index fields must materialize to the
same arrays either way."""

import shutil

import numpy as np
import pytest

from dart_tpu.index import layout_cache, loader


@pytest.fixture()
def tmp_index(tmp_path, golden_dir):
    src = golden_dir / "index"
    for f in src.iterdir():
        if f.name.startswith("toy"):
            shutil.copy(f, tmp_path / f.name)
    return str(tmp_path / "toy")


@pytest.fixture()
def force_eligible(monkeypatch):
    monkeypatch.setattr(layout_cache, "CACHE_MIN_SEQ", 0)


def test_save_load_roundtrip(tmp_path):
    arr = np.arange(48, dtype=np.uint32).reshape(6, 8)
    layout_cache.save_array(str(tmp_path / "x"), "ntab", arr,
                            {"seq_len": 123, "sa_intv": 8})
    got, h = layout_cache.load_array(str(tmp_path / "x"), "ntab",
                                     {"seq_len": 123, "sa_intv": 8})
    np.testing.assert_array_equal(got, arr)
    # key mismatch = miss
    miss, _ = layout_cache.load_array(str(tmp_path / "x"), "ntab",
                                      {"seq_len": 124, "sa_intv": 8})
    assert miss is None


def test_refpad_cache_hit_matches_derive(tmp_index, force_eligible):
    idx1 = loader.load_index(tmp_index)  # miss: derives + writes cache
    import os

    assert os.path.exists(tmp_index + ".refpad")
    idx2 = loader.load_index(tmp_index)  # hit: memmaps
    assert isinstance(idx2.ref_ascii_padded, np.memmap)
    np.testing.assert_array_equal(idx1.ref_ascii, idx2.ref_ascii)
    np.testing.assert_array_equal(np.asarray(idx1.ref_ascii_padded),
                                  np.asarray(idx2.ref_ascii_padded))
    # lazy ref_codes on the cache-hit path match the derive path
    np.testing.assert_array_equal(idx1.ref_codes, idx2.ref_codes)


def test_lazy_fields_match_eager_semantics(tmp_index):
    idx = loader.load_index(tmp_index)
    # materialize every lazy field; values must be self-consistent
    assert idx.bwt.shape[0] == idx.seq_len
    assert idx.occ.shape[1] == 4
    assert idx.sa_samples[0] == -1
    assert idx.sad_intv == 0 or idx.sad_samples[0] == -1
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    np.testing.assert_array_equal(idx.ref_ascii, lut[idx.ref_codes])
    # setter releases; getter re-derives
    idx.bwt = None
    assert idx._bwt is None


def test_engine_table_cache_hit_matches_build(tmp_index, force_eligible):
    jax = pytest.importorskip("jax")  # noqa: F841

    from dart_tpu.ops.fm_jax import FMIndexJax

    idx = loader.load_index(tmp_index)
    e1 = FMIndexJax(idx, lut_k=0)  # miss: builds + writes .ntab
    import os

    assert os.path.exists(tmp_index + ".ntab")
    idx2 = loader.load_index(tmp_index)
    e2 = FMIndexJax(idx2, lut_k=0)  # hit: memmaps
    assert (e1.ref_off, e1.sad_off) == (e2.ref_off, e2.sad_off)
    np.testing.assert_array_equal(np.asarray(e1.table),
                                  np.asarray(e2.table))
    rng = np.random.default_rng(3)
    codes = np.zeros((8, 64), np.uint8)
    for t in range(8):
        p = int(rng.integers(0, idx.seq_len - 65))
        codes[t] = idx.ref_codes[p:p + 64]
    rlens = np.full(8, 64, np.int32)
    got = e2.seed_reads(codes, rlens)
    want = e1.seed_reads(codes, rlens)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wide_engine_table_cache_hit_matches_build(tmp_index, force_eligible):
    pytest.importorskip("jax")

    from dart_tpu.ops.fm_jax_wide import FMIndexJaxWide

    idx = loader.load_index(tmp_index)
    e1 = FMIndexJaxWide(idx)  # miss: builds + writes .wtab
    import os

    assert os.path.exists(tmp_index + ".wtab")
    idx2 = loader.load_index(tmp_index)
    e2 = FMIndexJaxWide(idx2)  # hit
    assert (e1.ref_off, e1.sad_off) == (e2.ref_off, e2.sad_off)
    np.testing.assert_array_equal(np.asarray(e1.blocks),
                                  np.asarray(e2.blocks))
