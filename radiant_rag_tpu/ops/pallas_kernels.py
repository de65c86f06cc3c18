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


# ---------------------------------------------------------------------------
# Block-max scan: per-tile top-2 candidate generation (the round-2 winner).
#
# Round 1 measured the in-kernel running top-K (below) LOSING 2.1x to XLA at
# 1M: the K unrolled max-and-mask merges serialize VPU work against the MXU.
# But the XLA path is itself HBM-bound: the (B, N) int32 accumulator is
# written + re-read (8 GB at B=1024 x 1M -> ~34 ms of a 819 GB/s budget).
# This kernel keeps each (B, TILE) score block in VMEM and emits only the
# per-tile top-2 (max + masked-second-max + argmaxes) — four cheap VPU
# reductions, no sort, no running state, fully pipelined grid. HBM traffic
# falls to the int8 codes once (0.4 GB) + (B, 4*n_tiles) outputs (~32 MB).
# Candidate selection then runs in XLA over per-tile winners ((B, 2*n_tiles),
# 250x smaller), and the usual fp32 rescore recovers exact ordering. Top-2
# per tile bounds the loss: a true top-k doc is missed only when >=3
# candidates share one 512-row tile (rows are append-ordered, so top-k docs
# spread uniformly; collision odds at kc=40, 2048 tiles are per-mille).
# ---------------------------------------------------------------------------

BLOCKMAX_TILE = 512
BLOCKMAX_GROUP = 128  # tile-columns per output block (Mosaic lane width)
# query rows per grid block: the kernel's live intermediates (raw/scores/
# iota/rest) are (bb, TILE) f32/i32, ~4 blocks at once — bb=1024 keeps that
# ~8 MB, inside the 16 MB scoped-vmem limit (b=2048 unsplit OOMs by 96 KB)
BLOCKMAX_BATCH = 1024
INT_NEG = -(2**31) + 1


def _blockmax2_kernel(group, codes_ref, qi_ref, mask_ref, s1_ref, i1_ref, s2_ref, i2_ref):
    """One corpus tile -> per-query top-2 (scores int32, LOCAL argmax i32).

    Grid is (batch blocks, corpus tiles), tiles innermost. Output blocks hold
    `group` tile-columns; the grid revisits the same block for `group`
    consecutive steps (index_map i -> i // group), so Mosaic keeps it
    VMEM-resident and each step stores one column dynamically."""
    step = pl.program_id(1)
    col = jax.lax.rem(step, group)
    tile_n = codes_ref.shape[0]
    b = qi_ref.shape[0]
    # bf16 MXU matmul with f32 accumulation is EXACT here: int8 inputs are
    # integers <= 127 (exact in bf16), products <= 16129 are exact in the f32
    # accumulator, and sums over D <= 1040 dims stay < 2^24. Mosaic lowers an
    # int8xint8->int32 dot to VPU multiply-adds (~25x slower than the MXU),
    # so the cast is what makes this kernel win.
    raw = jax.lax.dot_general(
        qi_ref[:].astype(jnp.bfloat16), codes_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, TILE) f32, exact integers
    valid = mask_ref[:].reshape(1, tile_n) != 0
    scores = jnp.where(valid, raw, NEG)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    m1 = jnp.max(scores, axis=1, keepdims=True)  # (B, 1)
    p1 = jnp.min(jnp.where(scores == m1, iota, tile_n), axis=1, keepdims=True)
    rest = jnp.where(iota == p1, NEG, scores)
    m2 = jnp.max(rest, axis=1, keepdims=True)
    p2 = jnp.min(jnp.where(rest == m2, iota, tile_n), axis=1, keepdims=True)
    # Masked full-block RMW: Mosaic cannot prove lane alignment for a dynamic
    # single-column store, so select the column with an iota mask instead.
    # Every column is written exactly once per group (nt % group == 0), so the
    # first step's uninitialized read never survives to the writeback.
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, group), 1)
    sel = lane == col
    s1_ref[:] = jnp.where(sel, m1, s1_ref[:])
    i1_ref[:] = jnp.where(sel, jnp.where(m1 <= NEG / 2, -1, p1), i1_ref[:])
    s2_ref[:] = jnp.where(sel, m2, s2_ref[:])
    i2_ref[:] = jnp.where(sel, jnp.where(m2 <= NEG / 2, -1, p2), i2_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockmax2_pallas(
    codes: jax.Array,  # (N, D) int8, N % (BLOCKMAX_TILE * BLOCKMAX_GROUP) == 0
    qi: jax.Array,  # (B, D) int8 (scale-folded / indicator query)
    mask: jax.Array,  # (N,) bool/int8 validity
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Per-tile top-2 of the int8 scan: ((B, 2*NT) f32 scores — exact integer
    accumulators, (B, 2*NT) i32 GLOBAL rows, -1 where the tile had <2 valid
    rows). The (B, N) score matrix never leaves VMEM."""
    n, d = codes.shape
    b = qi.shape[0]
    nt = n // BLOCKMAX_TILE
    # Mosaic: output block last dim must be 128-divisible OR the full array
    # dim. Engine capacities are pow2, so nt is either a multiple of 128 or
    # small enough (<128) for a whole-array block.
    group = BLOCKMAX_GROUP if nt % BLOCKMAX_GROUP == 0 else nt
    # split large batches across a second grid axis (engine query buckets are
    # pow2, so bb always divides b; odd external batches run un-split as before)
    bb = BLOCKMAX_BATCH if b % BLOCKMAX_BATCH == 0 else b
    mask_i8 = mask.astype(jnp.int8).reshape(n, 1)
    ms = pltpu.VMEM
    interp = pltpu.InterpretParams() if interpret else False
    col = pl.BlockSpec((bb, group), lambda j, i: (j, i // group), memory_space=ms)
    s1, i1, s2, i2 = pl.pallas_call(
        functools.partial(_blockmax2_kernel, group),
        grid=(b // bb, nt),
        in_specs=[
            pl.BlockSpec((BLOCKMAX_TILE, d), lambda j, i: (i, 0), memory_space=ms),
            pl.BlockSpec((bb, d), lambda j, i: (j, 0), memory_space=ms),
            pl.BlockSpec((BLOCKMAX_TILE, 1), lambda j, i: (i, 0), memory_space=ms),
        ],
        out_specs=(col, col, col, col),
        out_shape=(jax.ShapeDtypeStruct((b, nt), jnp.float32),
                   jax.ShapeDtypeStruct((b, nt), jnp.int32),
                   jax.ShapeDtypeStruct((b, nt), jnp.float32),
                   jax.ShapeDtypeStruct((b, nt), jnp.int32)),
        interpret=interp,
    )(codes, qi, mask_i8)
    base = jnp.arange(nt, dtype=jnp.int32)[None, :] * BLOCKMAX_TILE
    rows1 = jnp.where(i1 >= 0, i1 + base, -1)
    rows2 = jnp.where(i2 >= 0, i2 + base, -1)
    return (jnp.concatenate([s1, s2], axis=1),
            jnp.concatenate([rows1, rows2], axis=1))


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
