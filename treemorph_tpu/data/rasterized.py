"""Rasterized datasets: spatial crops of big clouds as training samples.

Capability parity with reference
``Modules/DataLoading/RasterizedTreeSet.py``:

- :class:`RasterDataset` — the "flattened" view (:11-148): each per-raster
  ``.npy`` (trailing point-index column) is an independent sample;
- :class:`HierarchicalRasterDataset` — the hierarchical view (:152-268):
  one sample = one tree cut into rasters by AABB metadata JSON, with
  per-raster ``point_ids`` into the tree cloud so predictions can be
  scatter-mean reassembled (the reference's streaming path, :270-459);
- ``single_sample`` / overfit factories mirror :486-630.

TPU redesign: the reference streams raster minibatches through the model
with an immediate backward per minibatch to bound GPU memory
(``collate_fn_streaming``). Here every raster minibatch is an ordinary
static-shape :class:`~treemorph_tpu.data.treeset.PaddedBatch` — gradient
accumulation over minibatches replaces in-forward backward, and the
inference reassembly is a host-side scatter-mean
(:func:`treemorph_tpu.pipeline.predict.predict_rasterized`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from ..utils.io import load_cloud
from .treeset import PaddedBatch, TreeSample, make_padded_batch


class RasterDataset:
    """Flattened raster dataset: every raster file is its own sample."""

    def __init__(
        self,
        data_paths: Sequence[str],
        training: bool,
        noise_distance: float = 0.05,
        augment=None,
    ):
        self.data_paths = list(data_paths)
        self.training = training
        self.noise_distance = noise_distance
        self.augment = augment

    def __len__(self):
        return len(self.data_paths)

    def __getitem__(self, idx: int) -> TreeSample:
        data = load_cloud(self.data_paths[idx], all_columns=True)
        points = data[:, :3]
        offsets = data[:, 3:6]
        feats = data[:, 7:11]
        # trailing column is the point index into the source cloud
        # (reference RasterizedTreeSet.py:50-55); kept via the path
        off_norm = np.linalg.norm(offsets, axis=1)
        if self.augment is not None and self.training:
            points, offsets = self.augment(points, offsets)
        return TreeSample(
            points=points.astype(np.float32),
            feats=feats.astype(np.float32),
            offsets=offsets.astype(np.float32),
            semantic_label=(off_norm > self.noise_distance).astype(np.int32),
            offset_mask=off_norm <= self.noise_distance,
            path=self.data_paths[idx],
        )


@dataclass
class TreeRasters:
    """One tree expanded into rasters (hierarchical sample)."""

    points: np.ndarray  # (N, 3) full tree
    feats: np.ndarray  # (N, F)
    offsets: np.ndarray  # (N, 3)
    semantic_label: np.ndarray  # (N,)
    offset_mask: np.ndarray  # (N,)
    raster_point_ids: list[np.ndarray]  # per raster, indices into the tree
    path: str

    @property
    def cloud_length(self) -> int:
        return len(self.points)


class HierarchicalRasterDataset:
    """Tree-level dataset cut into rasters by AABB metadata JSON.

    The metadata layout is the rasterizer's
    (``treemorph_tpu.preprocess.rasterize``, reference
    ``RasterizeClouds.py:88-118``): ``{tree_id: {rasters: [{raster_id,
    bounds: {min, max}}], path}}``.
    """

    def __init__(
        self,
        paths: str | Sequence[str],
        training: bool = True,
        noise_distance: float = 0.05,
        minibatch_size: int = 20,
        single_sample: bool = False,
        augment=None,
    ):
        if isinstance(paths, str):
            paths = [paths]
        self.data: dict = {}
        for json_path in paths:
            with open(json_path) as f:
                new_data = json.load(f)
            for key, value in new_data.items():
                if key in self.data:
                    self.data[key]["rasters"].extend(value["rasters"])
                else:
                    self.data[key] = value
        self.tree_keys = list(self.data)
        if single_sample and self.tree_keys:
            self.tree_keys = self.tree_keys[:1]
        self.training = training
        self.noise_distance = noise_distance
        self.minibatch_size = minibatch_size
        self.augment = augment

    def __len__(self):
        return len(self.tree_keys)

    def __getitem__(self, idx: int) -> TreeRasters:
        info = self.data[self.tree_keys[idx]]
        data = load_cloud(info["path"], all_columns=True)
        if data.shape[1] == 3:
            data = np.concatenate(
                [data, np.zeros((len(data), 8), data.dtype)], axis=1
            )
        points = data[:, :3].astype(np.float32)
        offsets = data[:, 3:6].astype(np.float32)
        feats = data[:, 7:11].astype(np.float32)
        off_norm = np.linalg.norm(offsets, axis=1)
        if self.augment is not None and self.training:
            points, offsets = self.augment(points, offsets)

        raster_point_ids = []
        for raster in info["rasters"]:
            lo = np.asarray(raster["bounds"]["min"], np.float32)
            hi = np.asarray(raster["bounds"]["max"], np.float32)
            mask = np.all((points >= lo) & (points < hi), axis=1)
            idxs = np.nonzero(mask)[0]
            if len(idxs):
                raster_point_ids.append(idxs)

        return TreeRasters(
            points=points,
            feats=feats,
            offsets=offsets,
            semantic_label=(off_norm > self.noise_distance).astype(np.int32),
            offset_mask=off_norm <= self.noise_distance,
            raster_point_ids=raster_point_ids,
            path=info["path"],
        )

    def minibatches(
        self, tree: TreeRasters, bucket: int = 512
    ) -> Iterator[tuple[PaddedBatch, list[np.ndarray]]]:
        """Yield (PaddedBatch of rasters, per-raster point_ids) minibatches
        — the TPU equivalent of the reference streaming collate
        (RasterizedTreeSet.py:390-459)."""
        rasters = tree.raster_point_ids
        for start in range(0, len(rasters), self.minibatch_size):
            chunk = rasters[start : start + self.minibatch_size]
            samples = [
                TreeSample(
                    points=tree.points[idx],
                    feats=tree.feats[idx],
                    offsets=tree.offsets[idx],
                    semantic_label=tree.semantic_label[idx],
                    offset_mask=tree.offset_mask[idx],
                    path=tree.path,
                )
                for idx in chunk
            ]
            yield make_padded_batch(samples, bucket), list(chunk)


def raster_dataset_from_dir(
    raster_dir: str, training: bool, noise_distance: float = 0.05
) -> RasterDataset:
    """Flattened dataset over a rasterizer output directory."""
    paths = sorted(
        os.path.join(raster_dir, f)
        for f in os.listdir(raster_dir)
        if f.endswith(".npy")
    )
    return RasterDataset(paths, training, noise_distance)


def hierarchical_batch_iterator(
    dataset: HierarchicalRasterDataset,
    bucket: int = 512,
    rng: np.ndarray | None = None,
) -> Iterator[PaddedBatch]:
    """Stream raster minibatches of every tree as ordinary train batches.

    NOTE: through the standard harness each minibatch is its own
    optimizer step — a DEVIATION from the reference, which accumulates
    gradients across all of a tree-batch's minibatches and applies ONE
    optimizer step (``train_utils.py:46-62`` + ``PointNet2.py:296``).
    Use :func:`hierarchical_group_iterator` with
    :func:`treemorph_tpu.train.harness.make_accum_steps` for the
    reference semantics (the training CLI default).
    """
    rng = rng if rng is not None else np.random.default_rng(0)
    order = np.arange(len(dataset))
    if dataset.training:
        rng.shuffle(order)
    for t in order:
        tree = dataset[int(t)]
        for batch, _point_ids in dataset.minibatches(tree, bucket):
            yield batch


def hierarchical_group_iterator(
    dataset: HierarchicalRasterDataset,
    bucket: int = 512,
    rng: np.ndarray | None = None,
    trees_per_step: int = 1,
) -> Iterator[Iterator[PaddedBatch]]:
    """Yield one GROUP of raster minibatches per optimizer step.

    Matches the reference's hierarchical streaming training: a
    tree-batch of ``trees_per_step`` trees is cut into raster
    minibatches, each minibatch backpropagates into a shared gradient
    accumulator, and the optimizer steps once per group
    (``train_utils.py:46-62``, ``PointNet2.py:296``). Feed the groups to
    ``run_training(..., accum_steps=make_accum_steps(...))``.
    """
    rng = rng if rng is not None else np.random.default_rng(0)
    order = np.arange(len(dataset))
    if dataset.training:
        rng.shuffle(order)

    def group(tree_idxs):
        for t in tree_idxs:
            tree = dataset[int(t)]
            for batch, _point_ids in dataset.minibatches(tree, bucket):
                yield batch

    for start in range(0, len(order), trees_per_step):
        yield group(order[start : start + trees_per_step])
