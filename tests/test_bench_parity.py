"""Unit tests for bench.py's reference stale-FLAG normalization.

The reference formats FLAG from stale/uninitialized state in two
cases (Mapping.cpp:74-186 walks leftover slot state): single-end
unmapped reads, and half-mapped pairs (exactly one end unmapped),
where it can emit leftover proper-pair/mate bits. The normalization
target is the reference's INTENDED flags — the ones it emits when the
slot state happens to be clean (tests/golden/c5_pe.sam: 105/149) and
the ones dart-tpu's faithful port always emits (pipeline/report.py).
The round-trip test below pins the key invariant: normalizer target
== emitter output, for both strands and both mapped-end identities.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _norm_flags_pairwise


def test_single_end_unmapped_normalized():
    recs = [("r1", 0, "chr1"), ("r2", 16, "*"), ("r3", 16, "chr1")]
    assert _norm_flags_pairwise(recs) == [0, 4, 16]


def test_half_mapped_pair_stale_flags_normalized():
    # reference emits 147/99-style stale flags on half-mapped pairs;
    # the intended values (Mapping.cpp:101-186; golden c5_pe.sam) are
    # mapped end 1|8|first-last|(0x10 if reverse else 0x20),
    # unmapped end 1|4|first-last|(0x20 if mate reverse else 0x10)
    recs = [
        # pair A: end2 mapped reverse (stale 147), end1 unmapped
        # (stale 99)
        ("pA", 147, "chr1"),
        ("pA", 99, "*"),
        # pair B: end1 mapped forward with stale proper-pair bit,
        # end2 unmapped with stale mate-reverse
        ("pB", 67, "chr2"),
        ("pB", 131, "*"),
    ]
    got = _norm_flags_pairwise(recs)
    # pA mapped end reverse: keeps 0x10 + 0x80, gains mate-unmapped 8
    assert got[0] == 1 | 8 | 16 | 128
    # pA unmapped end: paired|unmapped|mate-reverse|0x40 kept
    assert got[1] == 1 | 4 | 32 | (99 & 0xC0)
    # pB mapped forward: mate stored RC'd -> mate-reverse 0x20 set
    assert got[2] == 1 | 8 | 32 | (67 & 0xC0)
    # pB unmapped end: own 0x10 set (its SEQ is printed RC'd)
    assert got[3] == 1 | 4 | 16 | (131 & 0xC0)


def test_half_mapped_golden_values_are_fixed_points():
    # the clean values the reference emitted in tests/golden/c5_pe.sam
    # must normalize to themselves
    recs = [("p102", 105, "chrA"), ("p102", 149, "*")]
    assert _norm_flags_pairwise(recs) == [105, 149]


def test_fully_mapped_and_fully_unmapped_pairs_untouched():
    recs = [
        ("q", 99, "chr1"), ("q", 147, "chr1"),   # proper pair: keep
        ("u", 77, "*"), ("u", 141, "*"),         # both unmapped: keep
    ]
    assert _norm_flags_pairwise(recs) == [99, 147, 77, 141]


def test_both_unmapped_pair_stale_flags_normalized():
    # seen at flagship scale (s12578_chr7, GRCh38 run): the reference
    # emitted 83/163 on a both-ends-unmapped pair — stale proper-pair
    # and strand bits on rname-* records. Intended values are
    # 0x41|4|8 = 77 and 0x81|4|8 = 141 (Mapping.cpp:148-151, 180-182)
    recs = [("s", 83, "*"), ("s", 163, "*")]
    assert _norm_flags_pairwise(recs) == [77, 141]


def test_lone_paired_record_passes_through():
    # a paired-flag record whose mate is not adjacent is left alone
    recs = [("x", 99, "chr1"), ("y", 0, "chr2")]
    assert _norm_flags_pairwise(recs) == [99, 0]


def _mk_read(score, sub_score, bdir):
    """Minimal stand-ins for report.set_paired_alignment_flag."""

    class Coor:
        pass

    class Rep:
        pass

    class Read:
        pass

    rep = Rep()
    rep.coor = Coor()
    rep.coor.bDir = bdir
    rep.AlnScore = score
    rep.PairedAlnCanIdx = -1
    rep.iFrag = 0
    rd = Read()
    rd.score = score
    rd.sub_score = sub_score
    rd.best_idx = 0
    rd.reports = [rep]
    return rd


def test_normalizer_round_trips_emitter_half_mapped():
    """The invariant the round-3 18/100000 parity gap violated: for
    every half-mapped geometry, normalizing ANY stale reference flag
    pair must yield exactly the flags pipeline/report.py emits."""
    from dart_tpu.pipeline import report

    for mapped_first in (True, False):
        for bdir in (True, False):
            r_mapped = _mk_read(60, 0, bdir)
            r_unmapped = _mk_read(0, 0, True)
            if mapped_first:
                report.set_paired_alignment_flag(r_mapped, r_unmapped)
            else:
                report.set_paired_alignment_flag(r_unmapped, r_mapped)
            want_m = r_mapped.reports[0].iFrag
            want_u = r_unmapped.reports[0].iFrag
            # the reference's stale emission keeps only 0xC0 and the
            # mapped end's own strand trustworthy; fuzz the rest
            for stale in (0x2, 0x20, 0x2 | 0x20, 0):
                mf = (want_m & (0xC0 | 0x10)) | 1 | stale
                uf = (want_u & 0xC0) | 1 | (stale & 0x2)
                recs = [("p", mf if mapped_first else uf,
                         "chr1" if mapped_first else "*"),
                        ("p", uf if mapped_first else mf,
                         "*" if mapped_first else "chr1")]
                got = _norm_flags_pairwise(recs)
                want = ([want_m, want_u] if mapped_first
                        else [want_u, want_m])
                assert got == want, (mapped_first, bdir, stale, got, want)
