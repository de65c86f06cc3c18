#!/usr/bin/env python
"""Device/runtime probe (analog of reference `tools/check_redis.py`, which
probes the storage service — here the "service" is the TPU runtime itself).

Reports: backend, device inventory, memory stats, a tiny compile+execute
round-trip with timing, and mesh viability.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import sys
import time


def main() -> int:
    out = {"ok": False}
    try:
        import jax
        import jax.numpy as jnp

        out["backend"] = jax.default_backend()
        out["devices"] = [str(d) for d in jax.devices()]
        out["device_count"] = jax.device_count()
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                out["memory"] = {k: v for k, v in stats.items()
                                 if "bytes" in k.lower()}
        except Exception:
            pass
        t0 = time.perf_counter()
        x = jnp.ones((128, 128))
        result = float((x @ x).sum())
        out["roundtrip_s"] = round(time.perf_counter() - t0, 3)
        out["compute_ok"] = abs(result - 128 * 128 * 128) < 1.0
        from radiant_rag_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        out["mesh"] = {name: size for name, size in
                       zip(mesh.axis_names, mesh.devices.shape)}
        out["ok"] = out["compute_ok"]
    except Exception as exc:
        out["error"] = f"{type(exc).__name__}: {exc}"
    print(json.dumps(out, indent=2))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
