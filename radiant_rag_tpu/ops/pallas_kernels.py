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


# ---------------------------------------------------------------------------
# Fused scan -> running top-K (no (B, N) score materialization).
#
# The XLA scans materialize all corpus scores in HBM before top-k ((B, N) f32
# = 256MB per 64-query batch at 1M rows). This kernel streams int8 corpus
# tiles through the MXU and maintains the exact per-query top-K in VMEM
# scratch across the (sequential) grid: per tile, the running (B, K) and the
# tile's (B, TILE) scores merge via K unrolled max-and-mask passes
# (lax.top_k has no Mosaic lowering; iterative max is exact, first-index tie
# break). HBM traffic = the int8 codes once + (B, K) out.
# ---------------------------------------------------------------------------

NEG = -3.0e38  # python float: jnp constants would be captured by kernels


def _scan_topk_kernel(k: int):
    def kernel(codes_ref, qi_ref, mask_ref, out_s_ref, out_i_ref,
               run_s_ref, run_i_ref):
        step = pl.program_id(0)
        tile_n = codes_ref.shape[0]
        b = qi_ref.shape[0]

        @pl.when(step == 0)
        def _():
            run_s_ref[:] = jnp.full((b, k), NEG, jnp.float32)
            run_i_ref[:] = jnp.full((b, k), -1, jnp.int32)

        raw = jax.lax.dot_general(
            qi_ref[:], codes_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)  # (B, TILE)
        valid = mask_ref[:].reshape(1, tile_n) != 0
        scores = jnp.where(valid, raw, NEG)
        gidx = (step * tile_n
                + jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1))

        comb_s = jnp.concatenate([run_s_ref[:], scores], axis=1)  # (B, K+TILE)
        comb_i = jnp.concatenate([run_i_ref[:], gidx], axis=1)
        width = k + tile_n
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
        for j in range(k):  # static unroll; K is small
            m = jnp.max(comb_s, axis=1, keepdims=True)  # (B, 1)
            pos = jnp.min(jnp.where(comb_s == m, iota, width), axis=1,
                          keepdims=True)  # first argmax
            sel = iota == pos
            run_s_ref[:, j] = m[:, 0]
            run_i_ref[:, j] = jnp.sum(jnp.where(sel, comb_i, 0), axis=1)
            comb_s = jnp.where(sel, NEG, comb_s)

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            out_s_ref[:] = run_s_ref[:]
            out_i_ref[:] = jnp.where(run_s_ref[:] > NEG / 2, run_i_ref[:], -1)

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def int8_scan_topk_pallas(
    codes: jax.Array,  # (N, D) int8, N % TILE_N == 0
    qi: jax.Array,  # (B, D) int8 scale-folded query
    mask: jax.Array,  # (N,) int8/bool validity
    k: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of the int8 scan without materializing (B, N) scores.

    Returns (scores (B, k) f32 RAW int32 dots, indices (B, k) i32, -1 pad);
    apply the affine dequant (scale/offset) to the returned scores outside."""
    n, d = codes.shape
    b = qi.shape[0]
    mask_i8 = mask.astype(jnp.int8).reshape(n, 1)
    grid = (n // TILE_N,)
    ms = pltpu.VMEM  # the TPU interpreter handles VMEM blocks directly
    # TPU-flavored interpreter: plain interpret=True rejects TPU memory-space
    # scratch on the CPU backend
    interp = pltpu.InterpretParams() if interpret else False
    out_s, out_i = pl.pallas_call(
        _scan_topk_kernel(k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=ms),
        ],
        out_specs=(pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=ms),
                   pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=ms)),
        out_shape=(jax.ShapeDtypeStruct((b, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, k), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interp,
    )(codes, qi, mask_i8)
    return out_s, out_i
