"""Multi-host (DCN) initialization scaffolding.

Single-slice multi-chip scaling is covered by `parallel/mesh.py` +
`parallel/sharded_index.py` (ICI collectives). Crossing hosts/slices (DCN)
requires `jax.distributed` process coordination; this module provides the
standard bring-up plus a mesh that keeps the corpus dimension on ICI and the
replica dimension on DCN (SURVEY.md §5.8: "index shards ride ICI; DCN for
multi-slice").

Untestable in a 1-chip environment — the API is exercised structurally only;
see ROADMAP.md.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up jax.distributed. Arguments default to cluster-env
    auto-detection (GKE/GCE metadata). Returns True when distributed mode is
    active. Safe to call in single-process runs (returns False)."""
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()  # env auto-detect
        logger.info("jax.distributed initialized: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
        return jax.process_count() > 1
    except Exception as exc:
        logger.info("multi-host initialization unavailable (%s); single-process mode", exc)
        return False


def host_shard_bounds(n_rows: int, process_id: Optional[int] = None,
                      num_processes: Optional[int] = None) -> tuple:
    """[start, end) corpus rows THIS host loads under the multihost mesh's
    per-host 'data' sharding (each host materializes only its slice — the
    full corpus never exists on one host). Defaults read jax.distributed
    state; single-process returns the full range. Remainder rows go to the
    leading hosts (matches jax even-sharding over a padded row space when
    callers pad to a multiple of num_processes, as the index engine's pow2
    capacities always are)."""
    import jax

    p = jax.process_index() if process_id is None else process_id
    n = max(jax.process_count() if num_processes is None else num_processes, 1)
    base, rem = divmod(n_rows, n)
    start = p * base + min(p, rem)
    return start, start + base + (1 if p < rem else 0)


def create_multihost_mesh(corpus_axis_per_host: bool = True):
    """Mesh with the corpus ('data') dimension inside each host's ICI domain
    and a 'replica' dimension across hosts (DCN): per-host index shards never
    communicate across DCN at query time; only the final tiny top-k merge (or
    full replication, the default serving mode) crosses hosts."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    n_local = jax.local_device_count()
    n_proc = max(jax.process_count(), 1)
    if corpus_axis_per_host and n_proc > 1:
        grid = devices.reshape(n_proc, n_local)
        return Mesh(grid, ("replica", "data"))
    return Mesh(devices.reshape(1, -1), ("replica", "data"))
