"""One-shot flagship `-all_sj -m` parity check (BASELINE config 5
shape, single-host: the multi-host merge of the same junction map is
covered by tests/test_distributed.py).

Runs the reference binary and dart_tpu on the GRCh38-class flagship
dataset with `-all_sj` (record junctions from every positive-score
alignment, not just mapq-max ones — main.cpp:178-183,
Mapping.cpp:620-637) and `-m` (report multiple alignments), then
compares the SAM records in order (stale-FLAG normalization as in
bench.py) and the junction tables record for record.

Usage: python tools/flagship_allsj_check.py
Commit the printed log to tests/golden/flagship_allsj.log.
"""

import contextlib
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

import bench

D = os.path.join(bench.WORK, "grch38_pe_bam")
REF_BIN = "/tmp/dart_ref/bin/dart"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> int:
    fq1 = os.path.join(D, "reads_100000_1.fq")
    fq2 = os.path.join(D, "reads_100000_2.fq")
    prefix = os.path.join(D, "idx")
    ref_sam = os.path.join(D, "ref_allsj.sam")
    ref_tab = os.path.join(D, "ref_allsj.junctions.tab")
    our_sam = os.path.join(D, "tpu_allsj.sam")
    our_tab = os.path.join(D, "tpu_allsj.junctions.tab")

    if not os.path.exists(ref_sam):
        log("reference -all_sj -m pass (oracle, cached after this)...")
        t0 = time.time()
        subprocess.run([REF_BIN, "-i", prefix, "-f", fq1, "-f2", fq2,
                        "-t", "1", "-mis", "5", "-all_sj", "-m",
                        "-j", ref_tab, "-silent", "-o", ref_sam],
                       check=True, capture_output=True, timeout=86400)
        log(f"reference done in {time.time() - t0:.0f}s")

    from dart_tpu.aligner import DartAligner, make_engine
    from dart_tpu.config import DartConfig
    from dart_tpu.index import load_index

    cfg = DartConfig()
    cfg.engine = "jax"
    cfg.max_mismatch = 5
    cfg.silent = True
    cfg.read_files_1 = [fq1]
    cfg.read_files_2 = [fq2]
    cfg.pair_end = True
    cfg.multi_hit = True
    cfg.find_all_junction = True
    cfg.output_file = our_sam
    cfg.sj_file = our_tab
    log("dart_tpu -all_sj -m pass...")
    t0 = time.time()
    idx = load_index(prefix)
    engine = make_engine(idx, cfg)
    a = DartAligner(idx, cfg, engine)
    with contextlib.redirect_stdout(sys.stderr):
        a.run()
    log(f"dart_tpu done in {time.time() - t0:.0f}s (incl. load+engine)")

    want_rows = bench._load_ref_records(ref_sam)
    want = ["\t".join(p) for p in want_rows]
    with open(our_sam) as f:
        got = [l.rstrip("\n") for l in f if not l.startswith("@")]
    same = sum(1 for x, y in zip(got, want) if x == y)
    log(f"SAM parity: {same}/{max(len(got), len(want))} identical "
        f"records (in order, stale-FLAG normalized)")
    with open(ref_tab) as f:
        wtab = f.read().splitlines()
    with open(our_tab) as f:
        gtab = f.read().splitlines()
    tsame = sum(1 for x, y in zip(gtab, wtab) if x == y)
    log(f"junction parity: {tsame}/{max(len(gtab), len(wtab))} identical "
        f"records (ours {len(gtab)}, ref {len(wtab)})")
    ok = (same == max(len(got), len(want))
          and tsame == max(len(gtab), len(wtab)))
    log("RESULT: " + ("PASS" if ok else "MISMATCH"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
