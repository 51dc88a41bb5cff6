"""Multi-host run: 2 local jax.distributed processes over byte-range
input shards must reproduce the single-host golden output exactly
(SAM concatenated in shard order + additively merged junction table)."""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = os.path.join(HERE, "data")
GOLD = os.path.join(HERE, "golden")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("reads,golden,extra", [
    ("se_exact.fa", "c1_se_exact", []),
    ("spliced.fa", "c3_spliced", []),
])
def test_two_process_run_matches_golden(tmp_path, reads, golden, extra):
    port = _free_port()
    out = tmp_path / "out.sam"
    sj = tmp_path / "junctions.tab"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the axon TPU plugin self-registers via sitecustomize and would
    # claim the backend; multi-process CPU needs it out of the way
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    for pid in range(2):
        cmd = [sys.executable, "-m", "dart_tpu.cli",
               "-i", os.path.join(GOLD, "index", "toy"),
               "-f", os.path.join(DATA, reads),
               "-o", str(out), "-j", str(sj), "-silent",
               "--dist-coordinator", f"127.0.0.1:{port}",
               "--dist-nprocs", "2", "--dist-pid", str(pid), *extra]
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE))
    for p in procs:
        try:
            outb, errb = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, errb.decode()[-2000:]

    got = out.read_text()
    want = open(os.path.join(GOLD, f"{golden}.sam")).read()
    assert got == want
    assert sj.read_text() == open(
        os.path.join(GOLD, f"{golden}.junctions.tab")).read()
