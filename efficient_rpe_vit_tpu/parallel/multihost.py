"""Multi-host (multi-process) training glue.

Everything else in `parallel/` assumes one Python process owning every
chip in the mesh — correct for the primary single-host v5e-8 target
(SURVEY.md §5.8). This module is the documented path past one host
(VERDICT r3 next #9): on a multi-host TPU slice, JAX runs one process
per host, each seeing only its local chips; `jax.distributed.initialize`
joins them into one global device set, after which every mesh/pjit/
NamedSharding construct in this package works unchanged because they all
build from `jax.devices()` (the GLOBAL list).

What actually changes per process:
  * initialization — `initialize()` below, once, before any device query;
  * data feeding — each process loads only its own slice of the global
    batch and `global_batch()` assembles the sharded global jax.Arrays
    from the per-host pieces (`jax.make_array_from_process_local_data`);
  * IO — checkpoints/metrics write once, gated on `is_coordinator()`
    (Orbax's sharded backend is already multihost-aware and coordinates
    internally; the gate is for the msgpack backend and logs).

The TPU compute path is untouched: XLA inserts the same ICI collectives
from the same sharding annotations, now spanning hosts (DCN only where
the mesh does).

No reference counterpart (the reference is single-process,
single-device); validated by a real 2-process CPU `jax.distributed`
dryrun in tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join this process into a multi-process JAX run.

    MUST run before the first device query (jax backends initialize
    lazily; anything that touched `jax.devices()` first pins the
    single-process world). On a real TPU pod slice all three arguments
    are auto-detected from the TPU metadata, so `initialize()` with no
    arguments is the production call; explicit values are for CPU
    dryruns and non-TPU clusters.

    Idempotent: a second call is a no-op (jax.distributed raises if
    re-initialized; we swallow exactly that case so `--distributed` can
    coexist with library callers that already initialized).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on exactly one process (process 0) — gate file writes and
    human-facing logs on this."""
    return jax.process_index() == 0


def host_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous row range of the global batch.

    The per-host dataloader convention: every process computes the same
    global permutation (seeds are broadcast-identical), then loads only
    `rows[host_batch_slice(B)]`. Requires the global batch to divide by
    the process count — raise early, loudly (a ragged split would
    deadlock the collectives mid-epoch instead).
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes — pick a batch size that is (each host "
            "feeds an equal shard)")
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_batch(local_tree, mesh: Mesh, axis: str = "data"):
    """Per-host numpy shards -> global jax.Arrays sharded over `axis`.

    `local_tree` is any pytree of numpy/jax arrays holding THIS process's
    rows of the global batch (see `host_batch_slice`). Each leaf becomes
    one global Array whose first dimension is the concatenation over
    processes, laid out on the mesh's `axis` — the multi-host equivalent
    of passing a full-batch numpy array to a jitted step with
    `in_shardings=P(axis)` on one host.
    """
    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(one, local_tree)


def broadcast_scalar(value, root: int = 0):
    """Agree on one Python scalar across processes (e.g. an epoch's
    derived seed, a resume epoch index read from disk by process 0)."""
    from jax.experimental import multihost_utils

    arr = np.asarray(value)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=(
        jax.process_index() == root))
    return out.item() if np.ndim(out) == 0 else out


def sync(tag: str = "sync") -> None:
    """Barrier across processes (e.g. before rmtree'ing a checkpoint dir
    that another process may still be reading)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
