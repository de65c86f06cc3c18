#!/usr/bin/env python
"""int8 calibration tool (reference `tools/calibrate_int8_ranges.py:31-161`):
sample embeddings from a saved index, compute per-dimension ranges, save as a
.npy artifact loadable via `quantization.int8_ranges_path`."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Calibrate int8 quantization ranges")
    parser.add_argument("index_dir")
    parser.add_argument("-o", "--output", default="int8_ranges.npy")
    parser.add_argument("-n", "--sample", type=int, default=10000)
    args = parser.parse_args(argv)

    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.ops.quantize import calibrate_int8_ranges

    store = TpuVectorStore.load(args.index_dir)
    n = store.engine.count
    if n == 0:
        print("index is empty", file=sys.stderr)
        return 1
    sample_n = min(n, args.sample)
    vecs = np.asarray(store.engine.vecs[:sample_n])
    lo, hi = calibrate_int8_ranges(vecs)
    ranges = np.stack([np.asarray(lo), np.asarray(hi)])
    np.save(args.output, ranges)
    print(f"calibrated over {sample_n} embeddings -> {args.output}")
    print(f"  lo: min={ranges[0].min():.4f} max={ranges[0].max():.4f}")
    print(f"  hi: min={ranges[1].min():.4f} max={ranges[1].max():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
