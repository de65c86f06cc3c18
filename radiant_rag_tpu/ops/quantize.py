"""On-device embedding quantization: sign-bit packing and calibrated int8.

Replaces the reference's delegation to `sentence_transformers.quantization`
(`storage/quantization.py:74-108`) and the numpy calibration tool
(`tools/calibrate_int8_ranges.py:142-159`) with pure-XLA ops that run where
the embeddings are produced, so ingest never leaves the device.

Quantization schemes (matching reference semantics):
  binary: bit d = (x_d > 0), packed into uint32 words (32x compression;
          reference packs to uint8 "ubinary", `quantization.py:139-156` —
          uint32 words are the TPU-friendly layout for XOR+popcount).
  int8:   per-dimension affine over calibrated [lo_d, hi_d] ranges
          (reference `quantization.py:159-182`):
            q_d = round((x_d - lo_d) / (hi_d - lo_d) * 255) - 128
          dequant: x̂_d = q_d * s_d + o_d,  s_d = (hi_d-lo_d)/255,
                   o_d = lo_d + 128 * s_d
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

WORD_BITS = 32


def packed_words(dim: int) -> int:
    """Number of uint32 words for `dim` sign bits."""
    return (dim + WORD_BITS - 1) // WORD_BITS


@jax.jit
def pack_binary(x: jax.Array) -> jax.Array:
    """Pack sign bits of (N, D) float embeddings into (N, D/32) uint32 words.

    Bit d of word w is set iff x[:, w*32+d] > 0. D must be a multiple of 32
    (384-dim MiniLM -> 12 words = 48 bytes/doc, 32x compression as in the
    reference's binary path, `docs: 1536MB -> 432MB @ 1M docs`).
    """
    n, d = x.shape
    if d % WORD_BITS != 0:
        pad = WORD_BITS - d % WORD_BITS
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-1.0)
        d = x.shape[1]
    bits = (x > 0).astype(jnp.uint32).reshape(n, d // WORD_BITS, WORD_BITS)
    weights = (jnp.uint32(1) << jnp.arange(WORD_BITS, dtype=jnp.uint32)).reshape(1, 1, WORD_BITS)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def calibrate_int8_ranges(sample: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-dimension (lo, hi) over a sample of embeddings
    (reference `quantization.py:159-182`, `tools/calibrate_int8_ranges.py`)."""
    lo = jnp.min(sample, axis=0)
    hi = jnp.max(sample, axis=0)
    # Guard degenerate dims so scale is never zero.
    eps = jnp.asarray(1e-6, sample.dtype)
    hi = jnp.where(hi - lo < eps, lo + eps, hi)
    return lo, hi


@jax.jit
def quantize_int8(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Affine int8 quantization over per-dim ranges; returns (N, D) int8."""
    scale = (hi - lo) / 255.0
    q = jnp.round((x - lo) / scale) - 128.0
    return jnp.clip(q, -128.0, 127.0).astype(jnp.int8)


@jax.jit
def dequantize_int8(q: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Inverse of `quantize_int8` (midpoint reconstruction)."""
    scale = (hi - lo) / 255.0
    return q.astype(jnp.float32) * scale + (lo + 128.0 * scale)


def int8_scale_offset(lo: jax.Array, hi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(s, o) such that dequant(q) = q * s + o."""
    s = (hi - lo) / 255.0
    return s, lo + 128.0 * s
