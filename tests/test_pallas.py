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
