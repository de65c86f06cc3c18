"""Vector-store factory (reference `storage/factory.py:21-138`).

The TPU engine is the primary backend; a pure-host numpy parity backend exists
for dev/debug (reference keeps three service backends for ops flexibility —
here pluggability is preserved with the same dispatch shape)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from radiant_rag_tpu.config import AppConfig
from radiant_rag_tpu.index.base import BaseVectorStore


def _create_tpu_store(config: AppConfig):
    """The tpu-backend path: load the persisted index when present, else
    start empty (reference `factory.py:40-61` durability semantics)."""
    import os

    from radiant_rag_tpu.index.store import TpuVectorStore

    manifest = os.path.join(config.index.data_dir, "manifest.json")
    if config.index.auto_persist and os.path.isfile(manifest):
        store = None
        try:
            store = TpuVectorStore.load(
                config.index.data_dir, index_config=config.index,
                quantization=config.quantization)
        except Exception as exc:
            import logging

            logging.getLogger(__name__).warning(
                "failed to load persisted index (%s); starting empty", exc)
        if store is not None:
            if store.dim != config.index.dim:
                # Fail fast and loud: proceeding would either crash deep
                # inside a jitted append or silently clobber the persisted
                # index on the next auto-persist save.
                raise ValueError(
                    f"persisted index at {config.index.data_dir!r} has "
                    f"dim={store.dim} but config.index.dim={config.index.dim}; "
                    "set index.dim to match the saved index, or point "
                    "index.data_dir elsewhere / clear it to re-ingest")
            import logging

            logging.getLogger(__name__).info(
                "loaded persisted index from %s (%d docs)",
                config.index.data_dir, store.count_documents())
            return store
    return TpuVectorStore(
        dim=config.index.dim,
        index_config=config.index,
        quantization=config.quantization,
    )


def create_vector_store(config: AppConfig) -> BaseVectorStore:
    """Dispatch on `config.index.backend` (reference `factory.py:40-61`)."""
    backend = config.index.backend
    if backend == "tpu":
        return _create_tpu_store(config)
    if backend == "sharded":
        # Pod-scale serving (SURVEY.md §5.8): a single-process TpuVectorStore
        # is the durable source of truth; its rows are frozen into
        # mesh-sharded device arrays with collective top-k merges, and
        # steady ingest lands in a delta segment (parallel/sharded_store.py).
        # Mesh axes come from config.mesh (-1 = all remaining devices).
        from radiant_rag_tpu.parallel.mesh import create_mesh
        from radiant_rag_tpu.parallel.sharded_store import ShardedVectorStore

        source = _create_tpu_store(config)
        mesh = create_mesh(data=config.mesh.data_axis,
                           model=config.mesh.model_axis)
        return ShardedVectorStore(mesh, source)
    if backend == "numpy":
        from radiant_rag_tpu.index.numpy_store import NumpyVectorStore

        return NumpyVectorStore(dim=config.index.dim, quantization=config.quantization)
    raise ValueError(
        f"unknown index backend: {backend!r} (expected tpu|sharded|numpy)")


def get_available_backends() -> List[str]:
    """Import-probe available backends (reference `factory.py:64-95`)."""
    available = ["numpy"]
    try:
        import jax  # noqa: F401

        available.insert(0, "tpu")
        available.insert(1, "sharded")
    except Exception:  # pragma: no cover
        pass
    return available


def validate_backend_config(config: AppConfig) -> Dict[str, Any]:
    """Sanity-check backend config (reference `factory.py:98-138`)."""
    issues: List[str] = []
    if config.index.backend not in ("tpu", "sharded", "numpy"):
        issues.append(f"unknown backend {config.index.backend}")
    if config.index.dim <= 0:
        issues.append("dim must be positive")
    if config.index.dim % 32 != 0:
        issues.append("dim should be a multiple of 32 for binary packing")
    try:
        config.quantization.validate()
    except ValueError as exc:
        issues.append(str(exc))
    return {"valid": not issues, "issues": issues}
