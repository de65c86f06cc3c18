"""Pallas/Mosaic kernels for scan ops where XLA's lowering is weak.

The binary Hamming scan is the main case: XLA materializes (B, chunk, W)
broadcast intermediates for XOR+popcount and its lowerings at 100k+ rows have
proven fragile (see ops/similarity.py notes). The Pallas kernel streams
corpus code tiles through VMEM and emits (B, tile) partial scores directly —
one pass over the 48B/doc packed codes at HBM bandwidth.

Kernels run `interpret=True` on CPU (tests) and compile via Mosaic on TPU.
Toggle with RADIANT_USE_PALLAS=1 (default off until Mosaic-on-tunnel compile
behavior is validated in this environment).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024


def use_pallas() -> bool:
    return os.environ.get("RADIANT_USE_PALLAS", "0") == "1"


def _hamming_kernel(codes_ref, qcodes_ref, out_ref):
    """One corpus tile: out[b, n] = sum_w popcount(codes[n, w] ^ q[b, w])."""
    codes = codes_ref[:]  # (TILE_N, W) uint32
    q = qcodes_ref[:]  # (B, W) uint32
    # (B, TILE_N, W) xor in VMEM; W is small (12 for 384-dim)
    x = jax.lax.population_count(q[:, None, :] ^ codes[None, :, :])
    out_ref[:] = jnp.sum(x.astype(jnp.int32), axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_scores_pallas(
    codes: jax.Array,  # (N, W) uint32, N % TILE_N == 0
    qcodes: jax.Array,  # (B, W) uint32
    interpret: bool = False,
) -> jax.Array:
    """(B, N) int32 hamming distances."""
    n, w = codes.shape
    b = qcodes.shape[0]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _hamming_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, w), lambda i: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE_N), lambda i: (0, i),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(codes, qcodes)


def _int8_scan_kernel(codes_ref, qi_ref, out_ref):
    """One corpus tile of the symmetric int8 scan: out = qi @ codes^T."""
    out_ref[:] = jax.lax.dot_general(
        qi_ref[:], codes_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_scores_pallas(
    codes: jax.Array,  # (N, D) int8, N % TILE_N == 0
    qi: jax.Array,  # (B, D) int8 (scale-folded query, see ops/similarity.py)
    interpret: bool = False,
) -> jax.Array:
    """(B, N) int32 raw dot products on the MXU, tile-streamed."""
    n, d = codes.shape
    b = qi.shape[0]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _int8_scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE_N), lambda i: (0, i),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(codes, qi)


def _hamming_kernel_t(codes_t_ref, qcodes_ref, out_ref):
    """Lane-major variant: codes arrive transposed (W, TILE_N) so every VPU op
    runs over the corpus dimension in full (sublane=B, lane=TILE_N) tiles —
    the (B, TILE_N, W) broadcast of the naive kernel wastes lanes on W=12."""
    ct = codes_t_ref[:]  # (W, TILE_N) uint32
    q = qcodes_ref[:]  # (B, W) uint32
    w = ct.shape[0]
    acc = jnp.zeros((q.shape[0], ct.shape[1]), jnp.int32)
    for i in range(w):  # static unroll over words (12 for 384-dim)
        acc = acc + jax.lax.population_count(
            q[:, i : i + 1] ^ ct[i][None, :]).astype(jnp.int32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_scores_pallas_t(
    codes_t: jax.Array,  # (W, N) uint32 TRANSPOSED packed codes, N % TILE_N == 0
    qcodes: jax.Array,  # (B, W) uint32
    interpret: bool = False,
) -> jax.Array:
    """(B, N) int32 hamming distances from lane-major codes."""
    w, n = codes_t.shape
    b = qcodes.shape[0]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _hamming_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, TILE_N), lambda i: (0, i), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, TILE_N), lambda i: (0, i),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), jnp.int32),
        interpret=interpret,
    )(codes_t, qcodes)
