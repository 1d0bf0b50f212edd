"""Multi-host input pipeline (SURVEY §2.2 DCN note; VERDICT A3).

The reference is single-process (one GPU, one DataLoader); on a TPU pod
each host owns a distinct slice of the global batch and only ever touches
its own files. The standard JAX recipe implemented here:

1. :func:`host_shard_paths` — deterministic per-host file sharding, so
   every host's local dataset is disjoint and the union covers the corpus.
2. :func:`global_batch_from_local` — wrap each host's locally-assembled
   ``PaddedBatch`` leaves into global ``jax.Array`` s via
   ``jax.make_array_from_process_local_data``: the global leading axis is
   ``data``-sharded over the mesh, each process contributing the rows its
   local devices own. Under ``pjit`` the train step then runs unchanged —
   collectives ride ICI, input IO rides each host's local disk/DCN.
3. :func:`multihost_batch_iterator` — the per-host training iterator:
   each host draws the SAME global permutation (seeded identically),
   takes the slice owned by its process, loads/pads only those trees, and
   yields globally-sharded batches.

Single-process environments (tests, the one-chip sandbox) degenerate
cleanly: process_count=1 means the "host shard" is the whole batch and
``make_array_from_process_local_data`` is just a sharded device_put.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .treeset import (
    PaddedBatch,
    TreeDataset,
    _cloud_stem,
    make_padded_batch,
    pad_to_bucket,
)


def host_shard_paths(
    paths: Sequence[str],
    process_index: int | None = None,
    process_count: int | None = None,
) -> list[str]:
    """The subset of ``paths`` this host owns (deterministic round-robin
    over the sorted list — every host computes the same assignment)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    ordered = sorted(paths)
    return ordered[process_index::process_count]


def global_batch_from_local(
    local_batch: PaddedBatch, mesh: Mesh, axis_name: str = "data"
) -> PaddedBatch:
    """Assemble a globally-sharded batch from this host's local rows.

    ``local_batch`` leaves carry this process's rows of the global batch
    (global_rows = local_rows * process_count, in process order). Every
    leaf becomes a global ``jax.Array`` sharded along ``axis_name``.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def wrap(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )

    return jax.tree.map(wrap, local_batch)


def multihost_batch_iterator(
    dataset: TreeDataset,
    global_batch_size: int,
    mesh: Mesh,
    bucket: int = 1024,
    shuffle: bool | None = None,
    seed: int = 0,
    axis_name: str = "data",
    process_index: int | None = None,
    process_count: int | None = None,
) -> Iterator[PaddedBatch]:
    """Per-host iterator over globally-sharded PaddedBatches.

    All hosts seed the same permutation; host ``p`` materializes rows
    ``[p*L, (p+1)*L)`` of each global batch (L = global/process_count) and
    wraps them into global arrays. Trailing partial batches are dropped —
    a global batch must fill every host.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if global_batch_size % process_count:
        raise ValueError(
            f"global_batch_size {global_batch_size} must divide over "
            f"{process_count} processes"
        )
    local = global_batch_size // process_count
    rng = np.random.default_rng(seed)
    if shuffle is None:
        shuffle = dataset.training

    # Every host must pad its local slice to the SAME point dimension or
    # the processes infer different global shapes and compile mismatched
    # SPMD programs. Point counts of every tree (and its noise cloud) are
    # read from the .npy headers up front — cheap (no data read) and
    # identical on all hosts.
    sizes = []
    for path in dataset.data_paths:
        n = np.load(path, mmap_mode="r").shape[0]
        base = os.path.basename(path)
        noise_path = dataset.noise_dict.get(
            base, dataset.noise_dict.get(_cloud_stem(base))
        )
        if noise_path is not None:
            n = max(n, np.load(noise_path, mmap_mode="r").shape[0])
        sizes.append(n)
    sizes = np.asarray(sizes)

    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order) - global_batch_size + 1,
                   global_batch_size):
        global_idx = order[i : i + global_batch_size]
        # pad target of the GLOBAL batch, same on every host
        target = pad_to_bucket(int(sizes[global_idx].max()), bucket)
        mine = order[i + process_index * local:
                     i + (process_index + 1) * local]
        local_batch = make_padded_batch(
            [dataset[j] for j in mine], bucket=target
        )
        yield global_batch_from_local(local_batch, mesh, axis_name)
