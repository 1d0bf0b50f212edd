"""Model construction + checkpoint loading for evaluation and the pipeline.

Capability parity with the reference loader
(``/root/reference/Modules/Evaluation/ModelLoaders.py:11-113``): given a
model family and offset/noise checkpoint directories, reconstruct the fixed
architectures (TreeLearn num_blocks=3 dim_feat=4 voxel 0.02; PTv3 voxel
0.02; PointNet2 depth=5 dim_feat=4) and return per-CV-plot model bundles
keyed ``{"O_P3": ..., "N_P3": ...}``.

Instead of parsing configuration out of checkpoint filenames, checkpoints
carry a ``metadata.json`` manifest (see
:mod:`treemorph_tpu.train.checkpoints`); filename plot parsing (``_P3`` etc.)
is still honored for directory layouts mirroring the reference.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models.pointnet2 import PointNet2
from ..models.ptv3 import PointTransformerWithHeads
from ..models.treelearn import TreeLearn
from ..train.checkpoints import load_metadata, restore_checkpoint

# Fixed per-family hyperparameters (reference ModelLoaders.py:31-113)
FAMILY_DEFAULTS = {
    "treelearn": dict(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02, kernel_size=3
    ),
    "pointtransformerv3": dict(dim_feat=4, use_feats=True, voxel_size=0.02),
    "pointnet2": dict(depth=5, dim_feat=4, use_coords=True, use_features=True),
}


@dataclass
class Predictor:
    """A ready-to-call model: family name + apply function + variables.

    ``apply(variables, batch_arrays...) -> output dict``; the call signature
    is family-specific, so the pipeline uses :meth:`predict_flat` /
    :meth:`predict_padded` which normalize it.
    """

    family: str
    model: Any
    variables: Any

    def _fn(self, kind: str, make):
        # cache the jitted apply per instance — a fresh lambda per call
        # would re-trace on every predict (one trace per cloud adds up)
        cache = self.__dict__.setdefault("_jit_cache", {})
        if kind not in cache:
            cache[kind] = jax.jit(make())
        return cache[kind]

    def predict_flat(self, coords, feats, batch_ids, valid):
        """Flat voxel-model layout (treelearn / ptv3)."""
        fn = self._fn(
            "flat",
            lambda: lambda p, c, f, b, v: self.model.apply(
                p, c, f, b, v, train=False
            ),
        )
        return fn(self.variables, coords, feats, batch_ids, valid)

    def predict_padded(self, coords, feats, valid):
        """Padded (B, N, ...) layout (pointnet2)."""
        fn = self._fn(
            "padded",
            lambda: lambda p, c, f, v: self.model.apply(
                p, c, f, v, train=False
            ),
        )
        return fn(self.variables, coords, feats, valid)


def build_model(model_type: str, batch_size: int = 1, **overrides):
    """Construct a model of the given family with the pipeline's fixed
    hyperparameters; overrides win."""
    model_type = model_type.lower()
    cfg = dict(FAMILY_DEFAULTS[model_type])
    cfg.update(overrides)
    if model_type == "treelearn":
        return TreeLearn(batch_size=batch_size, **cfg)
    if model_type == "pointtransformerv3":
        return PointTransformerWithHeads(**cfg)
    if model_type == "pointnet2":
        return PointNet2(
            depth=cfg["depth"],
            dim_feat=cfg["dim_feat"],
            use_coords=cfg["use_coords"],
            use_features=cfg["use_features"],
        )
    raise ValueError(f"unknown model type {model_type!r}")


def _init_variables(model_type: str, model, n_points: int = 256):
    if model_type == "pointtransformerv3":
        # the serialized attention requires the point count to be a
        # multiple of the (1024) patch; params are shape-independent so
        # any compliant template works
        n_points = max(model.enc_patch_size)
    rng = jax.random.key(0)
    if model_type == "pointnet2":
        init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=False))
        return init(
            rng,
            jnp.zeros((1, n_points, 3)),
            jnp.zeros((1, n_points, 4)),
            jnp.ones((1, n_points), bool),
        )
    init = jax.jit(
        lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
    )
    return init(
        rng,
        jnp.zeros((n_points, 3)),
        jnp.zeros((n_points, 4)),
        jnp.zeros(n_points, jnp.int32),
        jnp.ones(n_points, bool),
    )


def _plot_from_name(path: str) -> str | None:
    # accept the reference's "{Model}_P{n}[suffix]" naming and our train
    # CLI's bare "P{n}" checkpoint directories
    m = re.search(r"(?:^|_)P(\d+)(?!\d)", os.path.basename(path))
    return m.group(1) if m else None


def load_model(
    model_type: str,
    offset_model_dir: str | None = None,
    noise_model_dir: str | None = None,
    plots: tuple = (3, 4, 6, 8),
) -> dict[str, Predictor]:
    """Load per-plot offset ("O_P{n}") and noise ("N_P{n}") predictors.

    Directory layouts mirror the reference: one checkpoint per CV plot,
    with ``_P{n}`` in the name. Checkpoints are orbax directories written by
    :func:`treemorph_tpu.train.checkpoints.save_checkpoint`; metadata
    manifests override the family defaults when present.
    """
    out: dict[str, Predictor] = {}
    for prefix, model_dir in (("O", offset_model_dir), ("N", noise_model_dir)):
        if model_dir is None or not os.path.isdir(model_dir):
            continue
        for entry in sorted(os.listdir(model_dir)):
            full = os.path.join(model_dir, entry)
            if not os.path.isdir(full):
                continue
            plot = _plot_from_name(entry)
            if plot is None:
                continue
            meta = load_metadata(full) or {}
            overrides = {
                k: v
                for k, v in meta.items()
                if k in FAMILY_DEFAULTS[model_type.lower()]
                and v is not None  # null metadata must not override
            }
            model = build_model(model_type, **overrides)
            template = _init_variables(model_type.lower(), model)
            restored = restore_checkpoint(full, template)
            out[f"{prefix}_P{plot}"] = Predictor(
                family=model_type.lower(), model=model, variables=restored
            )
    return out
