"""Padded, static-shape dataset + batching for labeled tree clouds.

Capability parity with the reference data layer
(``/root/reference/Modules/DataLoading/TreeSet.py``): per-tree datasets built
from JSON path manifests, on-the-fly label derivation (semantic label = 1 for
noise where ``|offset| > noise_distance``, offset-regression mask where
``|offset| <= noise_distance``; ``TreeSet.py:107-122``), optional separate
noise clouds keyed by filename (``:44-49, 111-121``), and random / per-plot
split factories (``:337-386``).

TPU redesign: the reference has two collates (flat concat + ``batch_ids`` for
voxel models, pad-to-max + ``masks_pad`` for point models). On TPU every
batch must be static-shape, so there is ONE canonical layout — the padded
``(B, N, ...)`` :class:`PaddedBatch` with validity masks, where N is bucketed
(rounded up to a configurable multiple) to bound recompilation. Voxel models
consume the same batch flattened to ``(B*N, ...)`` with derived ``batch_ids``
(:meth:`PaddedBatch.flatten`), which is exactly the reference's flat layout.
Host->device transfer happens once per batch; everything downstream is jit.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, NamedTuple, Sequence

import numpy as np

from ..utils.io import load_cloud


class PaddedBatch(NamedTuple):
    """Canonical static-shape batch. All arrays padded to (B, N, ...)."""

    coords: np.ndarray  # (B, N, 3) float32
    feats: np.ndarray  # (B, N, F) float32
    offset_labels: np.ndarray  # (B, N, 3) float32
    semantic_labels: np.ndarray  # (B, N) int32: 1 = noise, 0 = keep
    mask_valid: np.ndarray  # (B, N) bool: real (non-pad) points
    mask_off: np.ndarray  # (B, N) bool: points with offset supervision

    @property
    def batch_size(self) -> int:
        return self.coords.shape[0]

    @property
    def num_points(self) -> int:
        return self.coords.shape[1]

    def flatten(self):
        """Flat-concat view: (B*N, ...) plus batch_ids — the voxel-model
        layout (reference ``collate_fn_voxel``, TreeSet.py:139-214)."""
        b, n = self.coords.shape[:2]
        batch_ids = np.repeat(np.arange(b, dtype=np.int32), n)
        return {
            "coords": self.coords.reshape(b * n, 3),
            "feats": self.feats.reshape(b * n, -1),
            "offset_labels": self.offset_labels.reshape(b * n, 3),
            "semantic_labels": self.semantic_labels.reshape(b * n),
            "mask_valid": self.mask_valid.reshape(b * n),
            "mask_off": self.mask_off.reshape(b * n),
            "batch_ids": batch_ids,
        }


def pad_to_bucket(n: int, bucket: int = 1024) -> int:
    """Round n up to a multiple of ``bucket`` (recompile containment)."""
    return max(((n + bucket - 1) // bucket) * bucket, bucket)


@dataclass
class TreeSample:
    points: np.ndarray  # (N, 3)
    feats: np.ndarray  # (N, F)
    offsets: np.ndarray  # (N, 3)
    semantic_label: np.ndarray  # (N,) int32
    offset_mask: np.ndarray  # (N,) bool
    path: str


class TreeDataset:
    """Host-side labeled-cloud dataset.

    Args:
        paths: JSON manifest path(s) listing .npy labeled clouds, or (with
            ``process_json=False``) the cloud paths themselves.
        training: shuffling flag for iteration.
        noise_distance: offset-norm threshold splitting surface/noise points.
        noise_root: optional directory of synthetic noise clouds; when a file
            with the same basename exists there, its offsets define the
            semantic labels (reference TreeSet.py:111-121).
        augment: optional callable (points, offsets, rng) -> (points, offsets).
    """

    def __init__(
        self,
        paths: str | Sequence[str],
        training: bool,
        noise_distance: float = 0.05,
        noise_root: str | None = None,
        process_json: bool = True,
        augment=None,
    ):
        if isinstance(paths, str):
            paths = [paths]
        self.data_paths: list[str] = []
        if process_json:
            for manifest in paths:
                with open(manifest) as f:
                    self.data_paths.extend(json.load(f))
        else:
            self.data_paths = list(paths)

        self.noise_dict: dict[str, str] = {}
        if noise_root:
            for name in os.listdir(noise_root):
                if name.endswith(".npy"):
                    self.noise_dict[name] = os.path.join(noise_root, name)

        self.training = training
        self.noise_distance = noise_distance
        self.augment = augment

    def __len__(self) -> int:
        return len(self.data_paths)

    def __getitem__(self, idx: int) -> TreeSample:
        path = self.data_paths[idx]
        data = load_cloud(path, all_columns=True)
        if data is None:
            raise FileNotFoundError(path)
        if data.shape[1] == 3:  # plain XYZ: zero labels/features
            data = np.concatenate(
                [data, np.zeros((len(data), 8), data.dtype)], axis=1
            )

        points = data[:, :3].astype(np.float32)
        offsets = data[:, 3:6].astype(np.float32)
        feats = data[:, 7:].astype(np.float32)

        off_norm = np.linalg.norm(offsets, axis=1)
        offset_mask = off_norm <= self.noise_distance

        name = os.path.basename(path)
        if name in self.noise_dict:
            noise = np.load(self.noise_dict[name])
            noise_norm = np.linalg.norm(noise[:, 3:6], axis=1)
            # The separate noise cloud drives the semantic head; points come
            # from it too so labels and coords stay aligned.
            semantic = (noise_norm > self.noise_distance).astype(np.int32)
        else:
            semantic = (off_norm > self.noise_distance).astype(np.int32)

        if self.augment is not None and self.training:
            points, offsets = self.augment(points, offsets)

        return TreeSample(
            points=points,
            feats=feats,
            offsets=offsets,
            semantic_label=semantic,
            offset_mask=offset_mask,
            path=path,
        )


def make_padded_batch(
    samples: Sequence[TreeSample], bucket: int = 1024
) -> PaddedBatch:
    """Pad a list of samples to a common bucketed length."""
    max_n = pad_to_bucket(max(len(s.points) for s in samples), bucket)
    b = len(samples)
    f = samples[0].feats.shape[1]

    coords = np.zeros((b, max_n, 3), np.float32)
    feats = np.zeros((b, max_n, f), np.float32)
    offs = np.zeros((b, max_n, 3), np.float32)
    sem = np.zeros((b, max_n), np.int32)
    valid = np.zeros((b, max_n), bool)
    moff = np.zeros((b, max_n), bool)

    for i, s in enumerate(samples):
        n = len(s.points)
        coords[i, :n] = s.points
        feats[i, :n] = s.feats
        offs[i, :n] = s.offsets
        sem[i, :n] = s.semantic_label
        valid[i, :n] = True
        moff[i, :n] = s.offset_mask
    return PaddedBatch(coords, feats, offs, sem, valid, moff)


def batch_iterator(
    dataset: TreeDataset,
    batch_size: int,
    bucket: int = 1024,
    shuffle: bool | None = None,
    rng: np.random.Generator | None = None,
    drop_last: bool = False,
) -> Iterator[PaddedBatch]:
    """Yield PaddedBatches; shuffles when training."""
    rng = rng or np.random.default_rng(0)
    if shuffle is None:
        shuffle = dataset.training
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order), batch_size):
        idx = order[i : i + batch_size]
        if drop_last and len(idx) < batch_size:
            break
        yield make_padded_batch([dataset[j] for j in idx], bucket)


def get_random_split(
    data_root: str, noise_distance: float = 0.05, noise_root=None, augment=None
):
    """trainset.json / testset.json split (reference TreeSet.py:337-354)."""
    return (
        TreeDataset(
            os.path.join(data_root, "trainset.json"),
            training=True,
            noise_distance=noise_distance,
            noise_root=noise_root,
            augment=augment,
        ),
        TreeDataset(
            os.path.join(data_root, "testset.json"),
            training=False,
            noise_distance=noise_distance,
            noise_root=noise_root,
        ),
    )


def get_plot_split(
    data_root: str,
    test_plot: int | str,
    noise_distance: float = 0.05,
    noise_root=None,
    augment=None,
):
    """Leave-one-plot-out split over plot_{n}.json manifests
    (reference TreeSet.py:357-386)."""
    train_manifests, test_manifests = [], []
    for name in os.listdir(data_root):
        if name.startswith("plot_") and name.endswith(".json"):
            plot_number = name.split("_")[1].split(".")[0]
            full = os.path.join(data_root, name)
            if plot_number == str(test_plot):
                test_manifests.append(full)
            else:
                train_manifests.append(full)
    return (
        TreeDataset(
            train_manifests,
            training=True,
            noise_distance=noise_distance,
            noise_root=noise_root,
            augment=augment,
        ),
        TreeDataset(
            test_manifests,
            training=False,
            noise_distance=noise_distance,
            noise_root=noise_root,
        ),
    )
