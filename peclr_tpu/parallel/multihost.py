"""Multi-host (pod) data feeding.

On a pod slice each process sees only its local devices; every host loads
its own slice of the global batch and the arrays are assembled into
globally-sharded jax.Arrays — the collectives then ride ICI exactly as in
the single-host program (the jitted step is identical).

Single-host meshes pass through unchanged, so the training loop calls this
unconditionally.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_host_local(mesh: Mesh, tree):
    """Assemble per-process local batches into global batch-sharded arrays.

    Each process passes its LOCAL shard (global_batch / num_processes rows);
    returns jax.Arrays whose global shape spans all hosts, sharded over the
    mesh's first axis.
    """
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, tree)


def local_batch_size(global_batch: int) -> int:
    """Rows this process must load (global batch split across hosts)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
