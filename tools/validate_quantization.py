#!/usr/bin/env python
"""Quantization validation tool (reference `tools/validate_quantization.py:27-360`):
imports, quantize -> dequantize round-trips, config validation, backend method
presence, and a small end-to-end recall check."""

from __future__ import annotations

import os
import sys

import numpy as np

# direct `python tools/validate_quantization.py` puts the script dir (not the
# repo root) on sys.path — the other tools carry the same shim
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


@check("imports")
def _imports():
    from radiant_rag_tpu.ops.quantize import (  # noqa: F401
        pack_binary, quantize_int8, dequantize_int8, calibrate_int8_ranges,
    )
    from radiant_rag_tpu.ops.similarity import two_stage_topk  # noqa: F401


@check("binary round-trip")
def _binary():
    import jax.numpy as jnp
    from radiant_rag_tpu.ops.quantize import pack_binary

    x = np.random.default_rng(0).standard_normal((8, 64)).astype(np.float32)
    packed = np.asarray(pack_binary(jnp.asarray(x)))
    assert packed.shape == (8, 2)
    bit0 = (packed[:, 0] & 1).astype(bool)
    assert np.array_equal(bit0, x[:, 0] > 0)


@check("int8 round-trip")
def _int8():
    import jax.numpy as jnp
    from radiant_rag_tpu.ops.quantize import (
        calibrate_int8_ranges, dequantize_int8, quantize_int8,
    )

    x = np.random.default_rng(1).standard_normal((64, 32)).astype(np.float32)
    lo, hi = calibrate_int8_ranges(jnp.asarray(x))
    back = np.asarray(dequantize_int8(quantize_int8(jnp.asarray(x), lo, hi), lo, hi))
    err = np.abs(back - x).max()
    step = float(np.asarray(hi - lo).max()) / 255
    assert err <= step, (err, step)


@check("config validation")
def _config():
    from radiant_rag_tpu.config import QuantizationConfig

    QuantizationConfig().validate()
    try:
        QuantizationConfig(precision="bad").validate()
    except ValueError:
        return
    raise AssertionError("invalid precision accepted")


@check("store API methods")
def _methods():
    from radiant_rag_tpu.index.store import TpuVectorStore

    for m in ("retrieve_by_embedding", "retrieve_by_embedding_quantized",
              "retrieve_by_embedding_batch", "upsert_batch"):
        assert callable(getattr(TpuVectorStore, m, None)), m


@check("end-to-end quantized recall")
def _recall():
    from radiant_rag_tpu.config import IndexConfig
    from radiant_rag_tpu.index.store import TpuVectorStore

    rng = np.random.default_rng(2)
    store = TpuVectorStore(dim=64, index_config=IndexConfig(dim=64, initial_capacity=256))
    docs = [(f"doc {i}", {}, rng.standard_normal(64)) for i in range(100)]
    store.upsert_batch(docs)
    q = np.asarray(docs[7][2])
    exact = {d.doc_id for d, _ in store.retrieve_by_embedding(q, top_k=10, quantized=False)}
    quant = {d.doc_id for d, _ in store.retrieve_by_embedding_quantized(q, top_k=10)}
    assert len(exact & quant) >= 6, f"overlap {len(exact & quant)}"


def main() -> int:
    failed = 0
    for name, fn in CHECKS:
        try:
            fn()
            print(f"  ok   {name}")
        except Exception as exc:
            failed += 1
            print(f"  FAIL {name}: {type(exc).__name__}: {exc}")
    print(f"{len(CHECKS) - failed}/{len(CHECKS)} checks passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
