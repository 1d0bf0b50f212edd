"""PointNet++ (PointNet2) with offset + semantic heads, in flax.

Capability parity with the reference model family
(``/root/reference/Modules/PointNet2/PointNet2.py``, ``blocks.py``):
hierarchical set-abstraction (SA) / feature-propagation (FP) stacks at depths
2-6 (depth 6 uses multi-scale grouping on the first level), shared per-point
heads (2-class semantic + 3-vector offset), and the same layer widths,
radii and group sizes (``PointNet2.py:38-100``).

TPU redesign notes:
- batches are padded (B, N, ...) tensors with validity masks threaded through
  FPS / ball query / interpolation (the reference's masks_pad machinery, but
  inside the kernels instead of only at the loss);
- the grouped-point MLPs are plain Dense layers over the channel axis of the
  (B, S, K, C) tensor — XLA maps them onto the MXU as large batched matmuls
  (the reference's 1x1 Conv2d + BatchNorm2d);
- everything is float32; the reference disables AMP for this backbone too
  (``PointNet2.py:146``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import (
    bucketed_farthest_point_sample,
    farthest_point_sample,
    index_points,
    query_ball_point,
    three_nn_interpolate,
)
from .loss import point_wise_loss

# Per-depth SA configs: (npoint, radius, nsample, mlp widths)
# (reference PointNet2.py:38-100)
SA_CONFIGS: dict[int, list] = {
    2: [
        (1024, 0.02, 32, (32, 32, 64)),
        (256, 0.2, 32, (64, 64, 128)),
    ],
    3: [
        (1024, 0.1, 32, (32, 32, 64)),
        (256, 0.3, 32, (64, 64, 128)),
        (64, 0.6, 32, (128, 128, 256)),
    ],
    4: [
        (1024, 0.1, 32, (32, 32, 64)),
        (256, 0.2, 32, (64, 64, 128)),
        (64, 0.4, 32, (128, 128, 256)),
        (16, 0.8, 32, (256, 256, 512)),
    ],
    5: [
        (100, 0.1, 32, (32, 32, 64)),
        (50, 0.2, 32, (64, 64, 128)),
        (20, 0.4, 32, (128, 128, 256)),
        (8, 0.8, 32, (256, 256, 512)),
    ],
    # depth 6: first level is multi-scale grouping (MSG)
    6: [
        (
            500,
            (0.02, 0.04, 0.08),
            (16, 32, 32),
            ((16, 16, 32), (32, 32, 64), (64, 64, 64)),
        ),
        (100, 0.2, 32, (64, 64, 128)),
        (50, 0.4, 32, (128, 128, 256)),
        (20, 0.8, 32, (256, 256, 512)),
    ],
}

# FP widths applied coarsest-to-finest; the last one produces the
# 128-channel backbone features (reference PointNet2.py:45-97).
FP_CONFIGS: dict[int, list] = {
    2: [(128, 128, 128), (128, 128, 128)],
    3: [(256, 256), (256, 128), (128, 128, 128)],
    4: [(256, 256), (256, 256), (256, 128), (128, 128, 128)],
    5: [(256, 256), (256, 256), (256, 128), (128, 128, 128)],
    6: [(256, 256), (256, 256), (256, 128), (128, 128, 128)],
}

_BN = dict(momentum=0.9, epsilon=1e-5)  # torch BatchNorm defaults
_HEAD_BN = dict(momentum=0.9, epsilon=1e-4)  # head norm_fn (PointNet2.py:22)


class PointwiseMLP(nn.Module):
    """Dense -> BN -> ReLU stack over the trailing channel axis."""

    features: Sequence[int]
    bn: dict

    @nn.compact
    def __call__(self, x, train: bool):
        for f in self.features:
            x = nn.Dense(f, use_bias=True)(x)
            x = nn.BatchNorm(use_running_average=not train, **self.bn)(x)
            x = nn.relu(x)
        return x


class Head(nn.Module):
    """Per-point prediction head (reference ConvHead, blocks.py:7-35)."""

    out_channels: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.num_layers - 1):
            x = nn.Dense(x.shape[-1])(x)
            x = nn.BatchNorm(use_running_average=not train, **_HEAD_BN)(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
        )(x)


class SetAbstraction(nn.Module):
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    fps_buckets: int = 1

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool, rng=None):
        fps_idx = bucketed_farthest_point_sample(
            xyz, valid, self.npoint, rng, buckets=self.fps_buckets
        )
        new_xyz = index_points(xyz, fps_idx)
        new_valid = jnp.take_along_axis(valid, fps_idx, axis=1)
        idx = query_ball_point(self.radius, self.nsample, xyz, new_xyz, valid)
        grouped = index_points(xyz, idx) - new_xyz[:, :, None, :]
        if feats is not None:
            grouped = jnp.concatenate(
                [grouped, index_points(feats, idx)], axis=-1
            )
        x = PointwiseMLP(self.mlp, _BN)(grouped, train)  # (B, S, K, C)
        return new_xyz, jnp.max(x, axis=2), new_valid


class SetAbstractionMsg(nn.Module):
    """Multi-scale grouping SA (reference blocks.py:103-160)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    fps_buckets: int = 1

    @nn.compact
    def __call__(self, xyz, feats, valid, train: bool, rng=None):
        fps_idx = bucketed_farthest_point_sample(
            xyz, valid, self.npoint, rng, buckets=self.fps_buckets
        )
        new_xyz = index_points(xyz, fps_idx)
        new_valid = jnp.take_along_axis(valid, fps_idx, axis=1)
        outs = []
        for radius, nsample, mlp in zip(
            self.radius_list, self.nsample_list, self.mlp_list
        ):
            idx = query_ball_point(radius, nsample, xyz, new_xyz, valid)
            grouped = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if feats is not None:
                grouped = jnp.concatenate(
                    [grouped, index_points(feats, idx)], axis=-1
                )
            x = PointwiseMLP(mlp, _BN)(grouped, train)
            outs.append(jnp.max(x, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), new_valid


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_to, xyz_from, feats_to, feats_from, valid_from,
                 train: bool):
        interp = three_nn_interpolate(xyz_to, xyz_from, feats_from, valid_from)
        if feats_to is not None:
            interp = jnp.concatenate([feats_to, interp], axis=-1)
        return PointwiseMLP(self.mlp, _BN)(interp, train)


class PointNet2(nn.Module):
    """PointNet++ backbone + heads.

    Call with a padded batch; returns a dict with ``backbone_feats``
    (B, N, 128), ``semantic_prediction_logits`` (B, N, 2) and
    ``offset_predictions`` (B, N, 3).
    """

    depth: int = 4
    dim_feat: int = 4
    use_coords: bool = True
    use_features: bool = True
    #: FPS bucket count: 1 = the reference's exact sequential recurrence
    #: (parity default); >1 = blocked parallel FPS
    #: (ops.sampling.bucketed_farthest_point_sample) — npoint sequential
    #: argmax steps become ceil(npoint/buckets), the TPU production mode
    fps_buckets: int = 1

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,  # (B, N, 3)
        feats: jax.Array,  # (B, N, F)
        valid: jax.Array,  # (B, N) bool
        train: bool = False,
        fps_rng: Optional[jax.Array] = None,
    ) -> dict:
        assert self.depth in SA_CONFIGS, f"unsupported depth {self.depth}"
        x = feats if self.use_features else None

        xyzs = [coords]
        valids = [valid]
        featss = [x]
        rngs = (
            jax.random.split(fps_rng, len(SA_CONFIGS[self.depth]))
            if fps_rng is not None
            else [None] * len(SA_CONFIGS[self.depth])
        )
        for level, cfg in enumerate(SA_CONFIGS[self.depth]):
            npoint, radius, nsample, mlp = cfg
            if isinstance(radius, tuple):
                sa = SetAbstractionMsg(
                    npoint, radius, nsample, mlp,
                    fps_buckets=self.fps_buckets,
                )
            else:
                sa = SetAbstraction(
                    npoint, radius, nsample, mlp,
                    fps_buckets=self.fps_buckets,
                )
            new_xyz, new_feats, new_valid = sa(
                xyzs[-1], featss[-1], valids[-1], train, rngs[level]
            )
            xyzs.append(new_xyz)
            featss.append(new_feats)
            valids.append(new_valid)

        fp_mlps = FP_CONFIGS[self.depth]
        n_levels = len(SA_CONFIGS[self.depth])
        # coarsest-to-finest; the last FP has no skip features
        # (reference passes None for l0, PointNet2.py:156)
        up = featss[-1]
        for j, mlp in enumerate(fp_mlps):
            level = n_levels - 1 - j  # target level
            skip = featss[level] if level > 0 else None
            up = FeaturePropagation(mlp)(
                xyzs[level],
                xyzs[level + 1],
                skip,
                up,
                valids[level + 1],
                train,
            )

        backbone = up  # (B, N, 128)
        sem = Head(2, name="semantic_head")(backbone, train)
        off = Head(3, name="offset_head")(backbone, train)
        return {
            "backbone_feats": backbone,
            "semantic_prediction_logits": sem,
            "offset_predictions": off,
        }


def pointnet2_loss(
    output: dict,
    batch,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    n_points: int | None = None,
    rng: jax.Array | None = None,
    axis_name: str | None = None,
):
    """Masked loss over a PaddedBatch (reference PointNet2.py:180-207)."""
    sem_loss, off_loss = point_wise_loss(
        output["semantic_prediction_logits"],
        output["offset_predictions"],
        batch.semantic_labels,
        batch.offset_labels,
        semantic_mask=batch.mask_valid,
        offset_mask=batch.mask_valid & batch.mask_off,
        n_points=n_points,
        rng=rng,
        axis_name=axis_name,
    )
    loss_dict = {
        "semantic_loss": sem_loss * loss_multiplier_semantic,
        "offset_loss": off_loss * loss_multiplier_offset,
    }
    return sum(loss_dict.values()), loss_dict
