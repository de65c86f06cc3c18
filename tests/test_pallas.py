"""Pallas kernel correctness in interpreter mode (CPU CI)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiant_rag_tpu.ops.pallas_kernels import (
    TILE_N, hamming_scores_pallas, int8_scores_pallas,
)


def test_hamming_kernel_matches_numpy(rng):
    n, w, b = 2 * TILE_N, 4, 8
    codes = rng.integers(0, 2**31, (n, w)).astype(np.uint32)
    qcodes = rng.integers(0, 2**31, (b, w)).astype(np.uint32)
    out = np.asarray(hamming_scores_pallas(
        jnp.asarray(codes), jnp.asarray(qcodes), interpret=True))
    # numpy popcount oracle
    xor = codes[None, :, :] ^ qcodes[:, None, :]
    oracle = np.zeros((b, n), np.int32)
    for shift in range(32):
        oracle += ((xor >> shift) & 1).sum(-1).astype(np.int32)
    np.testing.assert_array_equal(out, oracle)


def test_int8_kernel_matches_numpy(rng):
    n, d, b = 2 * TILE_N, 128, 8
    codes = rng.integers(-127, 128, (n, d)).astype(np.int8)
    qi = rng.integers(-127, 128, (b, d)).astype(np.int8)
    out = np.asarray(int8_scores_pallas(
        jnp.asarray(codes), jnp.asarray(qi), interpret=True))
    oracle = qi.astype(np.int64) @ codes.astype(np.int64).T
    np.testing.assert_array_equal(out.astype(np.int64), oracle)


def test_hamming_t_kernel_matches_numpy(rng):
    from radiant_rag_tpu.ops.pallas_kernels import hamming_scores_pallas_t

    n, w, b = 2 * TILE_N, 4, 8
    codes = rng.integers(0, 2**31, (n, w)).astype(np.uint32)
    qcodes = rng.integers(0, 2**31, (b, w)).astype(np.uint32)
    out = np.asarray(hamming_scores_pallas_t(
        jnp.asarray(codes.T.copy()), jnp.asarray(qcodes), interpret=True))
    xor = codes[None, :, :] ^ qcodes[:, None, :]
    oracle = np.zeros((b, n), np.int32)
    for shift in range(32):
        oracle += ((xor >> shift) & 1).sum(-1).astype(np.int32)
    np.testing.assert_array_equal(out, oracle)


def test_scan_topk_kernel_exact(rng):
    from radiant_rag_tpu.ops.pallas_kernels import int8_scan_topk_pallas

    n, d, b, k = 4 * TILE_N, 64, 4, 8
    codes = rng.integers(-80, 80, (n, d)).astype(np.int8)
    qi = rng.integers(-80, 80, (b, d)).astype(np.int8)
    mask = np.ones(n, np.int8)
    mask[100:200] = 0  # some dead rows
    s, i = int8_scan_topk_pallas(jnp.asarray(codes), jnp.asarray(qi),
                                 jnp.asarray(mask), k, interpret=True)
    s, i = np.asarray(s), np.asarray(i)
    oracle = qi.astype(np.int64) @ codes.astype(np.int64).T
    oracle = np.where(mask[None, :] != 0, oracle, -10**15)
    for qb in range(b):
        true = np.argsort(-oracle[qb], kind="stable")[:k]
        assert list(i[qb]) == list(true), (i[qb], true)
        np.testing.assert_allclose(s[qb], oracle[qb][true].astype(np.float64))


def test_engine_pallas_scan_mode(rng):
    """use_pallas_scan engine path matches the XLA int8 path (CPU: interpret
    is not wired into the engine, so just verify the flag falls back cleanly
    on non-aligned capacity and the config plumbs through)."""
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    cfg = IndexConfig(dim=32, initial_capacity=256, use_pallas_scan=True)
    store = TpuVectorStore(dim=32, index_config=cfg)
    assert store.engine.use_pallas_scan
    docs = [(f"d{i}", {}, rng.standard_normal(32)) for i in range(50)]
    store.upsert_batch(docs)
    # capacity 256 % TILE_N(1024) != 0 -> falls back to the XLA path
    hits = store.retrieve_by_embedding(np.asarray(docs[7][2]), top_k=5,
                                       min_similarity=-1.0)
    assert hits and hits[0][0].content == "d7"
