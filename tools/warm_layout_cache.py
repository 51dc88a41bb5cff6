"""Pre-derive the disk-backed layout cache for a big index.

Loading a GRCh38-class index derives ~12 GB of layouts (padded
reference text + the merged FM gather table) into anonymous memory,
which this host class first-touches at ~10-50 MB/s whenever a
large-RSS process exists (measured 67 min for one load). The loader
and engines write/read these as sidecar cache files
(index/layout_cache.py); this tool pays the one-time derivation cost
offline so every later aligner/bench start memmaps them at page-cache
speed.

Usage: python tools/warm_layout_cache.py <index_prefix>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(prefix: str) -> int:
    from dart_tpu.index import layout_cache, load_index

    t0 = time.time()
    idx = load_index(prefix)  # writes .refpad on a miss (if eligible)
    log(f"load_index: {time.time() - t0:.1f}s seq_len={idx.seq_len:,}")
    if not layout_cache.eligible(idx.seq_len):
        log(f"seq_len {idx.seq_len:,} below cache threshold "
            f"{layout_cache.CACHE_MIN_SEQ:,}; nothing to warm")
        return 0
    if not os.path.exists(prefix + ".refpad"):
        log("WARNING: .refpad missing after load (read-only dir?)")
    wide = idx.seq_len >= 2 ** 31
    kind = "wtab" if wide else "ntab"
    # validity probe, not existence: the cache is keyed on the
    # effective sa_intv too (a regenerated .sad must invalidate it —
    # the engines would silently rebuild inline otherwise)
    probe_meta = {"seq_len": int(idx.seq_len),
                  "sa_intv": int(idx.sad_intv or idx.sa_intv)}
    cached, _h = layout_cache.load_array(prefix, kind, probe_meta)
    if cached is not None:
        del cached
        log(f".{kind} already cached (metadata valid)")
        return 0
    t0 = time.time()
    if wide:
        from dart_tpu.ops.fm_jax_wide import build_merged_table_wide

        merged, ref_off, sad_off = build_merged_table_wide(idx)
        sa_intv = idx.sad_intv or idx.sa_intv
    else:
        from dart_tpu.ops.fm_jax import (build_device_layout,
                                         build_merged_table)

        samples = (idx.sad_samples if idx.sad_intv
                   else idx.sa_samples).astype("int32")
        merged, ref_off, sad_off = build_merged_table(
            idx, build_device_layout(idx), samples)
        sa_intv = idx.sad_intv or idx.sa_intv
    log(f"merged table built: {time.time() - t0:.1f}s "
        f"({merged.nbytes / 1e9:.2f} GB, {merged.shape[0]:,} rows)")
    t0 = time.time()
    layout_cache.save_array(prefix, kind, merged,
                            {"seq_len": int(idx.seq_len),
                             "sa_intv": int(sa_intv),
                             "ref_off": int(ref_off),
                             "sad_off": int(sad_off)})
    log(f".{kind} written: {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
