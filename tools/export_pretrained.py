#!/usr/bin/env python
"""Export trained orbax checkpoints as shipped params-only npz artifacts.

Reads the train checkpoints produced by tools/bench_quality_scale.py (or
the `train` CLI) and writes the compact float32 artifacts the Embedder /
CrossEncoder fall back to for weightless deployments
(`radiant_rag_tpu/models/pretrained.py`).

Usage:
  python tools/export_pretrained.py --embedder data/embedder_ckpt \
      --cross-encoder data/ce_ckpt --dim 128 --layers 6 --ce-layers 6
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embedder", default="data/embedder_ckpt")
    ap.add_argument("--cross-encoder", default="")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--ce-layers", type=int, default=6)
    ap.add_argument("--vocab", type=int, default=8192)
    args = ap.parse_args(argv)

    from radiant_rag_tpu.models.pretrained import PRETRAINED_DIR, save_params_npz
    from radiant_rag_tpu.parallel.checkpoint import TrainCheckpointer

    out = {}
    if args.embedder:
        params = TrainCheckpointer(args.embedder).restore()["params"]
        path = PRETRAINED_DIR / f"embedder_{args.dim}x{args.layers}.npz"
        save_params_npz(params, str(path))
        out["embedder"] = {"path": str(path),
                           "mb": round(path.stat().st_size / 1e6, 1)}
    if args.cross_encoder:
        params = TrainCheckpointer(args.cross_encoder).restore()["params"]
        path = PRETRAINED_DIR / f"cross_encoder_{args.dim}x{args.ce_layers}.npz"
        save_params_npz(params, str(path))
        out["cross_encoder"] = {"path": str(path),
                                "mb": round(path.stat().st_size / 1e6, 1)}
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
