"""Unit tests for bench.py's reference stale-FLAG normalization.

The reference formats FLAG from stale/uninitialized state in two
cases (Mapping.cpp:74-186 walks leftover slot state): single-end
unmapped reads, and half-mapped pairs (exactly one end unmapped),
where it emits leftover proper-pair/mate-reverse bits. dart-tpu emits
the SAM-correct values; the bench normalizes the reference side to
those before the record-for-record comparison (README's divergence
list documents both classes).
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
    # the SAM-correct values are mapped end 1|8|strand|first-last,
    # unmapped end 1|4|(0x20 iff mate reverse)|first-last
    recs = [
        # pair A: end1 mapped reverse (stale 147 = 1|2|16|128... here
        # named as end2 by 0x80), end2 unmapped (stale 99)
        ("pA", 147, "chr1"),
        ("pA", 99, "*"),
        # pair B: end1 mapped forward with stale proper-pair bit,
        # end2 unmapped with stale mate-reverse
        ("pB", 67, "chr2"),
        ("pB", 131, "*"),
    ]
    got = _norm_flags_pairwise(recs)
    # pA mapped end keeps strand 0x10 + 0x80, gains mate-unmapped 8
    assert got[0] == 1 | 8 | 16 | 128
    # pA unmapped end: paired|unmapped|mate-reverse|0x40-or-0x80 kept
    assert got[1] == 1 | 4 | 32 | (99 & 0xC0)
    # pB mapped forward: no strand bit, no mate-reverse on the mate
    assert got[2] == 1 | 8 | (67 & 0xC0)
    assert got[3] == 1 | 4 | (131 & 0xC0)


def test_fully_mapped_and_fully_unmapped_pairs_untouched():
    recs = [
        ("q", 99, "chr1"), ("q", 147, "chr1"),   # proper pair: keep
        ("u", 77, "*"), ("u", 141, "*"),         # both unmapped: keep
    ]
    assert _norm_flags_pairwise(recs) == [99, 147, 77, 141]


def test_lone_paired_record_passes_through():
    # a paired-flag record whose mate is not adjacent is left alone
    recs = [("x", 99, "chr1"), ("y", 0, "chr2")]
    assert _norm_flags_pairwise(recs) == [99, 0]
