"""Regenerate the small bench datasets + parity oracles after a VM
restart, without running the timed measurement loop. Runs bench.py's
own ensure_dataset / time_index_builds / ensure_parity_oracle for the
non-prebuilt configs so the end-of-round `python bench.py` only has to
measure."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> int:
    t0 = time.time()
    for cname, spec in bench.CONFIGS.items():
        if spec.get("prebuilt"):
            continue
        ds = bench.ensure_dataset(cname, spec)
        bench.time_index_builds(cname, spec, ds)
        bench.ensure_parity_oracle(cname, spec, ds)
        bench.log(f"prep[{cname}]: ready ({time.time() - t0:.0f}s elapsed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
