"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.2); multi-chip
scale-out is net-new capability here. The design follows the standard JAX
SPMD recipe: one ``Mesh`` with a ``data`` axis, batches sharded on their
leading axis, parameters replicated, and XLA GSPMD inserting the gradient
``psum`` automatically because the loss is a cross-shard masked mean.

Plot-scale inference shards spatial tiles over the same axis (the
reference's raster streaming, ``RasterizedTreeSet.py:390-459``, becomes a
sharded map + scatter-mean reassembly in :mod:`treemorph_tpu.pipeline`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array leaf along its leading axis over the mesh.

    Leading dims must divide the mesh size; use
    :func:`pad_batch_to_multiple` first when they do not.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        arr = np.asarray(x)
        return jax.device_put(arr, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad a PaddedBatch's leading dim with all-invalid elements so it
    divides the mesh; masked losses make the padding contribute nothing."""
    b = batch.coords.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch

    def pad_leading(x):
        if x is None:  # optional fields (e.g. PaddedBatch noise quartet)
            return None
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), widths)

    return type(batch)(*(pad_leading(x) for x in batch))
