"""Record the data-parallel throughput-vs-device-count curve.

Runs the dryrun_multichip scaling section at a realistic chunk size
(32k reads by default) on the virtual CPU mesh and prints the table —
the attainable substitute for a pod scaling run (on the virtual mesh
every "device" shares one physical host, so the numbers validate the
sharded program set and batch division, not ICI scaling; see
MULTICHIP notes). Output is committed to
tests/golden/multichip_scaling.log.

  python tools/multichip_scaling.py [--reads 32768] [--devices 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"  # the axon env exports JAX_PLATFORMS=axon


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["DART_TPU_SCALING_READS"] = str(args.reads)
    import __graft_entry__ as g

    g.dryrun_multichip(args.devices)


if __name__ == "__main__":
    main()
