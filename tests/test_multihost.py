"""Two-process DCN execution test for parallel/multihost.py.

Spawns two fresh Python processes that join a jax.distributed cluster over
localhost (gRPC — the same transport JAX uses across real hosts/DCN) and run
tests/dcn_worker.py: initialize_multihost, create_multihost_mesh,
host_shard_bounds, and a cross-process all_gather top-k merge verified
against a full-corpus oracle.

Reference parity anchor: the reference scales across hosts with
NCCL/MPI-style process groups; here the equivalent is jax.distributed +
a replica-over-DCN mesh (SURVEY.md §2.8 / §5.8).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from radiant_rag_tpu.parallel.multihost import host_shard_bounds

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dcn_all_gather_merge():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # workers pin their own backend; scrub any inherited device-count flag so
    # each process gets exactly 4 virtual devices
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    worker = REPO / "tests" / "dcn_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(REPO),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    payloads = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("DCN_OK ")]
        assert line, f"no DCN_OK line in:\n{out}"
        d = json.loads(line[-1][len("DCN_OK "):])
        payloads[d["pid"]] = d

    assert payloads[0]["bounds"] == [0, 256]
    assert payloads[1]["bounds"] == [256, 512]
    assert payloads[0]["mesh"] == {"replica": 2, "data": 4}
    # both processes fetched the same replicated merge result
    assert payloads[0]["top1_row"] == payloads[1]["top1_row"]


def test_host_shard_bounds_single_process_cover():
    # explicit-arg path needs no jax.distributed state
    n = 1037
    spans = [host_shard_bounds(n, p, 4) for p in range(4)]
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c and b > a and d > c
    # remainder rows go to leading hosts
    sizes = [b - a for a, b in spans]
    assert sizes == sorted(sizes, reverse=True)
