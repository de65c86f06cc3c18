"""Corpus-sharded retrieval: shard_map scan + collective top-k merge.

The multi-chip analog of DeviceVectorIndex: corpus rows are sharded over the
mesh 'data' axis (each chip holds N/n_shards rows of vectors + packed binary
codes in its HBM); a query batch is replicated; each shard scans locally and
the per-shard top-k (score, global_row) pairs are merged with an
`all_gather` over ICI followed by a final top-k — no host round-trips
(SURVEY.md §5.8, §7.4.2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiant_rag_tpu.ops import quantize as qz
from radiant_rag_tpu.ops import similarity as sim


def _shard_search_body(
    vecs: jax.Array,  # (rows/shard, D) local block
    codes: jax.Array,  # (rows/shard, W) local block
    valid: jax.Array,  # (rows/shard,) local block
    queries: jax.Array,  # (B, D) replicated
    qcodes: jax.Array,  # (B, W) replicated
    k: int,
    kc: int,
    mode: str,
    rows_per_shard: int,
) -> Tuple[jax.Array, jax.Array]:
    """Runs on each shard inside shard_map; returns globally-merged top-k."""
    # Rows are sharded over the flattened ('data','model') product axis.
    shard = jax.lax.axis_index(("data", "model"))
    if mode == "exact":
        s, i = sim.exact_topk(vecs, queries, valid, k)
    else:
        s, i = sim.two_stage_topk(
            vecs, queries, valid, k, kc, "hamming",
            binary_codes=codes, qbinary=qcodes,
        )
    gi = i + shard * rows_per_shard  # local -> global rows
    gi = jnp.where(s > sim.NEG_INF / 2, gi, -1)
    # Merge across shards over ICI: gather (B, n*k) then final top-k.
    all_s = jax.lax.all_gather(s, ("data", "model"), axis=1, tiled=True)  # (B, n*k)
    all_i = jax.lax.all_gather(gi, ("data", "model"), axis=1, tiled=True)
    top_s, sel = jax.lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, sel, axis=1)
    return top_s, top_i


class ShardedFlatIndex:
    """Static sharded dense index built from host arrays (bulk/load path).

    Mutation model: built from a host snapshot (or merged from a
    DeviceVectorIndex); incremental updates go to the single-chip engine and
    periodic rebuilds refresh the sharded copy — the segment/compaction story
    for immutable device arrays (SURVEY.md §7.4.3).
    """

    def __init__(self, mesh: Mesh, vecs: np.ndarray, valid: Optional[np.ndarray] = None):
        self.mesh = mesh
        n_shards = mesh.devices.shape[0] * (mesh.devices.shape[1] if len(mesh.devices.shape) > 1 else 1)
        # rows padded to a multiple of shard count (and lane alignment)
        n, d = vecs.shape
        self.dim = d
        self.n_docs = n
        per = -(-n // n_shards)
        per = ((per + 127) // 128) * 128  # lane-align each shard block
        total = per * n_shards
        self.rows_per_shard = per
        vp = np.zeros((total, d), np.float32)
        vp[:n] = vecs
        vmask = np.zeros((total,), bool)
        vmask[:n] = True if valid is None else valid
        codes = np.asarray(qz.pack_binary(jnp.asarray(vp)))

        row_sharding = NamedSharding(mesh, P(("data", "model"),))
        mat_sharding = NamedSharding(mesh, P(("data", "model"), None))
        self.vecs = jax.device_put(vp, mat_sharding)
        self.codes = jax.device_put(codes, mat_sharding)
        self.valid = jax.device_put(vmask, row_sharding)
        self._n_shards = n_shards
        self._search_cache = {}

    def _get_program(self, k: int, kc: int, mode: str):
        key = (k, kc, mode)
        if key not in self._search_cache:
            body = partial(
                _shard_search_body,
                k=k, kc=kc, mode=mode, rows_per_shard=self.rows_per_shard,
            )
            mapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P(("data", "model"), None),  # vecs
                    P(("data", "model"), None),  # codes
                    P(("data", "model"),),  # valid
                    P(),  # queries replicated
                    P(),  # qcodes replicated
                ),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._search_cache[key] = jax.jit(mapped)
        return self._search_cache[key]

    def search(
        self,
        queries: np.ndarray,  # (B, D)
        k: int,
        mode: str = "binary",
        rescore_multiplier: float = 4.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, np.float32)
        queries = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
        k_eff = min(k, self.rows_per_shard)
        kc = min(max(k_eff, int(round(k_eff * rescore_multiplier))), self.rows_per_shard)
        qdev = jnp.asarray(queries)
        qcodes = qz.pack_binary(qdev)
        prog = self._get_program(k_eff, kc, mode)
        s, i = prog(self.vecs, self.codes, self.valid, qdev, qcodes)
        return np.asarray(s), np.asarray(i).astype(np.int64)
