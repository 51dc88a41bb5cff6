"""Index loading: BWA-format files -> in-memory arrays + TPU layouts.

Mirrors the reference loader semantics (/root/reference/src/bwt_index.cpp:
bwa_idx_load :147, RestoreReferenceInfo :229) but keeps everything as
NumPy arrays and adds a device-friendly FM-index block layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..constants import OCC_INTERVAL
from . import packer


@dataclass
class Chromosome:
    name: str
    length: int
    forward_location: int
    reverse_location: int


@dataclass
class Index:
    # FM-index (host layout)
    primary: int
    L2: np.ndarray              # int64[5]
    bwt: np.ndarray             # uint8[seq_len] BWT codes ($ row removed)
    occ: np.ndarray             # int64[(n_blocks+1), 4] checkpoints every OCC_INTERVAL
    sa_samples: np.ndarray      # int64[n_sa] (entry 0 = seq_len, unused)
    sa_intv: int
    seq_len: int                # 2 * genome_size

    # Reference sequences
    genome_size: int
    ref_codes: np.ndarray       # uint8[2*genome_size]: fwd codes ++ revcomp codes
    ref_ascii: np.ndarray       # uint8[2*genome_size]: 'A'.. 'T' ASCII

    chromosomes: list[Chromosome] = field(default_factory=list)
    # ChrLocMap equivalent: sorted end-coordinate keys and their chr idx
    chr_end_keys: np.ndarray = None
    chr_end_idx: np.ndarray = None
    # dart_tpu extension: dense SA samples for the device locate kernel
    sad_samples: np.ndarray = None  # int32[n] or None
    sad_intv: int = 0
    # ref_ascii with REF_GUARD 'N' bytes on each side (ref_ascii is a
    # view into its interior); the native pipeline binds it zero-copy
    ref_ascii_padded: np.ndarray = None

    def chr_lower_bound(self, g_pos) -> np.ndarray:
        """Index into chr_end_keys of the first key >= g_pos
        (std::map::lower_bound equivalent)."""
        return np.searchsorted(self.chr_end_keys, g_pos, side="left")


def deinterleave_bwt(payload: np.ndarray, seq_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Split an interleaved .bwt payload into (bwt codes, occ checkpoints).

    The native single-pass splitter serves big genomes (NumPy's
    broadcasting path degrades badly past 2^31 elements — ~15 min for
    a 2.2e9-position text vs seconds in C++); the vectorized NumPy
    body below is the toolchain-free twin."""
    n_blocks = (seq_len + OCC_INTERVAL - 1) // OCC_INTERVAL
    try:
        import ctypes

        from ..native import build as native_build

        lib = native_build.load()
    except Exception:
        lib = None
    if lib is not None and hasattr(lib, "dart_deinterleave_bwt"):
        codes = np.empty(seq_len, dtype=np.uint8)
        occ = np.empty((n_blocks + 1, 4), dtype=np.int64)
        pay = np.ascontiguousarray(payload, dtype=np.uint32)
        lib.dart_deinterleave_bwt(
            pay.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.c_int64(seq_len),
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            occ.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return codes, occ
    wpb = OCC_INTERVAL // 16
    n_words = (seq_len + 15) // 16
    n_full = seq_len // OCC_INTERVAL

    words = np.empty(n_words, dtype=np.uint32)
    occ = np.empty((n_blocks + 1, 4), dtype=np.int64)

    body_len = n_full * (8 + wpb)
    body = payload[:body_len].reshape(n_full, 8 + wpb) if n_full else payload[:0].reshape(0, 8 + wpb)
    occ[:n_full] = body[:, :8].copy().view("<u8").reshape(n_full, 4).astype(np.int64)
    words[: n_full * wpb] = body[:, 8:].reshape(-1)
    pos = body_len
    if n_blocks > n_full:
        occ[n_full] = payload[pos : pos + 8].copy().view("<u8").astype(np.int64)
        pos += 8
        tail = n_words - n_full * wpb
        words[n_full * wpb :] = payload[pos : pos + tail]
        pos += tail
    occ[n_blocks] = payload[pos : pos + 8].copy().view("<u8").astype(np.int64)

    # Unpack words to per-base codes.
    shifts = (np.arange(15, -1, -1, dtype=np.uint32) * 2)[None, :]
    codes = ((words[:, None] >> shifts) & 3).astype(np.uint8).reshape(-1)[:seq_len]
    return codes, occ


# 'N' guard bytes on each side of the padded ascii buffer: the native
# pipeline's continuation probes and splice-motif reads may index a few
# bytes past an alignment at the fwd/RC text boundary (the reference
# allocates TwoGenomeSize+1 and relies on slack); guards make the reads
# defined and never match A/C/G/T. Allocated HERE, at load time, so the
# native pipeline can use the buffer zero-copy instead of re-allocating
# and copying another genome-size array (6.2 GB at GRCh38 scale).
REF_GUARD = 256


def _derive_ref(pac_path: str, l_pac: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ref_codes, ref_ascii, ref_ascii_padded) from .pac, where
    ref_codes = fwd ++ revcomp codes, ref_ascii = the same as ACGT
    bytes, and ref_ascii is a view into ref_ascii_padded's interior
    (REF_GUARD 'N' bytes on each side).

    The native single-pass derivation avoids ~4x genome-size NumPy
    temporaries (decisive at GRCh38 scale in a degraded host-fault
    window); the NumPy body below is the toolchain-free twin."""
    with open(pac_path, "rb") as f:
        data = f.read()
    rem = data[-1]
    n = (len(data) - 2) * 4 + rem if rem else (len(data) - 2) * 4
    assert n == l_pac, (n, l_pac)
    padded = np.empty(2 * l_pac + 2 * REF_GUARD, dtype=np.uint8)
    padded[:REF_GUARD] = ord("N")
    padded[2 * l_pac + REF_GUARD:] = ord("N")
    ref_ascii = padded[REF_GUARD:2 * l_pac + REF_GUARD]
    try:
        import ctypes

        from ..native import build as native_build

        lib = native_build.load()
    except Exception:
        lib = None
    if lib is not None and hasattr(lib, "dart_ref_from_pac"):
        pac = np.frombuffer(data[: (n + 3) // 4], dtype=np.uint8)
        ref_codes = np.empty(2 * l_pac, dtype=np.uint8)
        lib.dart_ref_from_pac(
            pac.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(l_pac),
            ref_codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ref_ascii.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return ref_codes, ref_ascii, padded
    fwd = packer.pac_bytes_to_codes(
        np.frombuffer(data[: (n + 3) // 4], dtype=np.uint8), n)
    rc = (3 - fwd[::-1]).astype(np.uint8)
    ref_codes = np.concatenate([fwd, rc])
    ref_ascii[:] = np.frombuffer(b"ACGT", dtype=np.uint8)[ref_codes]
    return ref_codes, ref_ascii, padded


def load_index(prefix: str) -> Index:
    # .bwt
    with open(prefix + ".bwt", "rb") as f:
        data = f.read()
    header = np.frombuffer(data[:40], dtype="<u8")
    primary = int(header[0])
    L2 = np.zeros(5, dtype=np.int64)
    L2[1:] = header[1:5].astype(np.int64)
    seq_len = int(L2[4])
    payload = np.frombuffer(data[40:], dtype="<u4")
    bwt, occ = deinterleave_bwt(payload, seq_len)

    # .sa
    with open(prefix + ".sa", "rb") as f:
        sdata = f.read()
    sheader = np.frombuffer(sdata[:56], dtype="<u8")
    sa_intv = int(sheader[5])
    n_sa = (seq_len + sa_intv) // sa_intv
    sa_samples = np.empty(n_sa, dtype=np.int64)
    # Row 0 is the $ row; a locate walk that passes it needs steps-1,
    # hence the -1 sentinel (bwt_index.cpp:31, bwt.c:122 comment).
    sa_samples[0] = -1
    sa_samples[1:] = np.frombuffer(sdata[56:], dtype="<u8", count=n_sa - 1).astype(np.int64)

    # .sad (optional dense samples, builder.write_sad_file)
    sad_samples = None
    sad_intv = 0
    import os

    if os.path.exists(prefix + ".sad"):
        with open(prefix + ".sad", "rb") as f:
            sdd = f.read()
        magic, intv, n_sad = np.frombuffer(sdd[:24], dtype="<u8")
        if magic in (0x44415344, 0x44415345):  # "DSAD" i4 / "ESAD" i8
            dt = "<i4" if magic == 0x44415344 else "<i8"
            sad_samples = np.frombuffer(sdd[24:], dtype=dt,
                                        count=int(n_sad)).copy()
            sad_samples[0] = -1  # $ row sentinel, as with .sa
            sad_intv = int(intv)

    # .ann / .pac
    l_pac, _seed, contigs = packer.read_ann(prefix + ".ann")
    assert 2 * l_pac == seq_len
    ref_codes, ref_ascii, ref_pad = _derive_ref(prefix + ".pac", l_pac)

    chromosomes: list[Chromosome] = []
    keys = []
    idxs = []
    total = 0
    for i, c in enumerate(contigs):
        fwd_loc = total
        total += c.length
        rev_loc = seq_len - total
        chromosomes.append(Chromosome(c.name, c.length, fwd_loc, rev_loc))
        keys.append(fwd_loc + c.length - 1)
        idxs.append(i)
        keys.append(rev_loc + c.length - 1)
        idxs.append(i)
    order = np.argsort(np.asarray(keys, dtype=np.int64), kind="stable")
    chr_end_keys = np.asarray(keys, dtype=np.int64)[order]
    chr_end_idx = np.asarray(idxs, dtype=np.int64)[order]

    return Index(
        primary=primary,
        L2=L2,
        bwt=bwt,
        occ=occ,
        sa_samples=sa_samples,
        sa_intv=sa_intv,
        seq_len=seq_len,
        genome_size=l_pac,
        ref_codes=ref_codes,
        ref_ascii=ref_ascii,
        ref_ascii_padded=ref_pad,
        chromosomes=chromosomes,
        chr_end_keys=chr_end_keys,
        chr_end_idx=chr_end_idx,
        sad_samples=sad_samples,
        sad_intv=sad_intv,
    )
