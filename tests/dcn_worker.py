"""Worker process for the two-process DCN test (tests/test_multihost.py).

Run as: python tests/dcn_worker.py <coordinator> <num_processes> <process_id>

Each process pins itself to a 4-virtual-device CPU backend, joins the
jax.distributed cluster over localhost (this IS the DCN transport JAX uses
between hosts — gRPC process coordination + cross-host collectives), and then:

1. initialize_multihost           -> True, 2 processes x 4 devices = 8 global
2. create_multihost_mesh          -> (replica=2 across hosts, data=4 on "ICI")
3. host_shard_bounds              -> disjoint per-host corpus slices
4. cross-process top-k merge      -> corpus rows sharded over BOTH axes; each
   host materializes ONLY its slice (jax.make_array_from_process_local_data);
   a shard_map computes local top-k and all_gathers partials across the
   replica (DCN) axis — the merged result must equal a full-corpus oracle.

Prints one line "DCN_OK <payload-json>" on success; any assert kills the
process and fails the parent test.
"""

import json
import os
import sys

# CPU pin BEFORE any jax import side effects: sitecustomize registers the real
# TPU plugin, so the env var alone is not enough (tests/conftest.py pattern).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from radiant_rag_tpu.parallel.multihost import (  # noqa: E402
    create_multihost_mesh,
    host_shard_bounds,
    initialize_multihost,
)


def main() -> None:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    active = initialize_multihost(coordinator, n_proc, pid)
    assert active, "initialize_multihost returned False for a 2-process run"
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == n_proc * 4, jax.device_count()

    mesh = create_multihost_mesh()
    assert mesh.axis_names == ("replica", "data"), mesh.axis_names
    assert mesh.devices.shape == (n_proc, 4), mesh.devices.shape
    # the replica axis must actually cross hosts: every device in row p
    # belongs to process p (corpus/data stays on one host's "ICI" domain)
    for row in range(n_proc):
        assert {d.process_index for d in mesh.devices[row]} == {row}, (
            "replica axis does not map 1:1 onto hosts")

    # --- host_shard_bounds: disjoint cover of the corpus ------------------
    n_docs, dim, k = 512, 64, 8
    lo, hi = host_shard_bounds(n_docs)
    assert (lo, hi) == ((0, 256) if pid == 0 else (256, 512)), (lo, hi)

    # --- cross-process sharded top-k merge --------------------------------
    # Full corpus is a deterministic function of a shared seed so the oracle
    # can be computed locally, but the global device array is assembled from
    # per-host slices only (each host "ingests" only its bounds).
    rng = np.random.default_rng(7)
    full = rng.standard_normal((n_docs, dim)).astype(np.float32)
    full /= np.linalg.norm(full, axis=1, keepdims=True)
    queries = rng.standard_normal((4, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    row_sharding = NamedSharding(mesh, P(("replica", "data"), None))
    local_slice = full[lo:hi]  # this host's ingest split
    vecs = jax.make_array_from_process_local_data(row_sharding, local_slice)
    rows_per_dev = n_docs // (n_proc * 4)

    def body(v, q):
        # v: (rows_per_dev, D) local shard; q: (B, D) replicated
        scores = q @ v.T  # (B, rows_per_dev)
        s, i = jax.lax.top_k(scores, k)
        dev = jax.lax.axis_index("replica") * 4 + jax.lax.axis_index("data")
        gi = i + dev * rows_per_dev  # local row -> global row
        # partial top-k crosses the host boundary here: all_gather over the
        # replica axis is a DCN collective between the two processes
        s_all = jax.lax.all_gather(s, ("replica", "data"), axis=1, tiled=True)
        i_all = jax.lax.all_gather(gi, ("replica", "data"), axis=1, tiled=True)
        ms, sel = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, sel, axis=1)

    prog = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(("replica", "data"), None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    s, i = prog(vecs, jnp.asarray(queries))
    s = np.asarray(jax.device_get(s))
    i = np.asarray(jax.device_get(i))

    oracle = queries @ full.T
    oi = np.argsort(-oracle, axis=1)[:, :k]
    os_ = np.take_along_axis(oracle, oi, axis=1)
    assert np.array_equal(i, oi), (i[0], oi[0])
    np.testing.assert_allclose(s, os_, rtol=1e-5)

    print("DCN_OK " + json.dumps({
        "pid": pid, "bounds": [lo, hi],
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "top1_row": int(i[0, 0]),
    }), flush=True)


if __name__ == "__main__":
    main()
