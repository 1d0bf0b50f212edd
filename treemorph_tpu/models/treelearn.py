"""TreeLearn: submanifold sparse U-Net with offset/semantic heads, in flax.

Capability parity with the reference model
(``/root/reference/Modules/TreeLearn/TreeLearn.py`` + ``blocks.py``):
voxelize -> input submanifold conv -> recursive U-Net (channels i*32,
stride-2 down / inverse up convs, pairs of residual blocks, skip concat) ->
BN+ReLU -> per-point unprojection -> MLP heads. The optional separate
noise-cloud backbone pass (``TreeLearn.py:98-105``) is wired up by
:func:`treemorph_tpu.train.families.treelearn_noise_family`.

TPU redesign: spconv's rulebook GPU kernels are replaced by the hash-table
gather/scatter engine in :mod:`treemorph_tpu.ops.sparse`; every resolution
level builds one rulebook shared by all its submanifold convs (the
reference's ``indice_key``). BatchNorm is mask-aware because padded voxel
rows exist (the reference's spconv tensors are exact-sized).

Training and inference default to ``verify_coords=False``: rulebook
lookups are probabilistic dual-hash (false-hit ~1e-7 per forward,
bucket-overflow drop ~1e-12 — bounds in ``ops/sparse.py``). A false hit
also breaks the rulebook antisymmetry the conv's custom VJP mirrors, so
the corresponding gradient rows are slightly wrong, not just the forward.
Set ``verify_coords=True`` (one extra (Q, 4) coordinate gather per
lookup) for collision-proof runs.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bandconv import choose_band_plan
from ..ops.bricks import (
    BRICK,
    BrickStructure,
    brick_subm_conv,
    brickize,
    from_dense,
    to_dense,
)
from ..ops.pencil import (
    PencilStructure,
    build_pencils,
    from_pencil,
    pencil_conv_apply,
    to_pencil,
)
from ..ops.sparse import (
    DownsampleMap,
    build_downsample,
    build_rulebook,
    build_zplan,
    down_conv_apply,
    inverse_conv_apply,
    subm_conv_apply,
)
from ..ops.voxelize import voxelize_treelearn_features
from .loss import point_wise_loss

_KERNEL_INIT = nn.initializers.variance_scaling(1.0, "fan_in", "normal")


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows only (padding excluded from statistics).

    torch semantics: momentum 0.1 (new = 0.9 old + 0.1 batch), eps 1e-4
    (the reference's norm_fn, TreeLearn.py:48).
    """

    momentum: float = 0.9
    epsilon: float = 1e-4

    @nn.compact
    def __call__(self, x, mask, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            w = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(jnp.sum(w), 1.0)
            # zero masked rows BEFORE arithmetic: huge sentinel values in
            # padding rows would otherwise produce inf*0 = NaN
            xw = jnp.where(mask[:, None], x, 0.0)
            mean = jnp.sum(xw, axis=0) / cnt
            centered = jnp.where(mask[:, None], x - mean, 0.0)
            var = jnp.sum(jnp.square(centered), axis=0) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class SubMConv(nn.Module):
    """Submanifold conv layer over a precomputed rulebook (no bias).

    ``needs_feats_grad=False`` marks convs whose inputs are raw data
    (the input/stem conv): the band engine's backward then skips the
    fused d_feats+d_w kernel for the cheap DCE-friendly gather
    formulation (the fused kernel cannot drop its d_feats half)."""

    out_channels: int
    kernel_size: int = 3
    conv_dtype: str = "float32"
    needs_feats_grad: bool = True

    @nn.compact
    def __call__(self, feats, rulebook, valid):
        k = self.kernel_size**3
        w = self.param(
            "kernel", _KERNEL_INIT, (k, feats.shape[-1], self.out_channels)
        )
        return subm_conv_apply(
            feats, w, rulebook, valid,
            compute_dtype=jnp.dtype(self.conv_dtype),
            needs_feats_grad=self.needs_feats_grad,
        )


class ResidualBlock(nn.Module):
    """Pre-activation residual pair of submanifold convs
    (reference TreeLearn/blocks.py:44-81)."""

    out_channels: int
    kernel_size: int = 3
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, feats, rulebook, valid, train: bool):
        cin = feats.shape[-1]
        if cin == self.out_channels:
            identity = feats
        else:
            w = self.param(
                "shortcut", _KERNEL_INIT, (cin, self.out_channels)
            )
            identity = jnp.dot(
                feats, w, preferred_element_type=jnp.float32
            )

        x = MaskedBatchNorm()(feats, valid, train)
        x = nn.relu(x)
        x = SubMConv(self.out_channels, self.kernel_size, self.conv_dtype)(
            x, rulebook, valid
        )
        x = MaskedBatchNorm()(x, valid, train)
        x = nn.relu(x)
        x = SubMConv(self.out_channels, self.kernel_size, self.conv_dtype)(
            x, rulebook, valid
        )
        return x + identity


class PencilCoreConv(nn.Module):
    """Pencil-space submanifold conv. Named ``SubMConv_{i}`` inside
    :class:`PencilResidualBlock` so the param tree is IDENTICAL to the
    gather engine's — checkpoints are engine-interchangeable."""

    out_channels: int
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, core, ps: PencilStructure):
        cin = core.shape[1] // ps.cell_active.shape[1]
        w = self.param("kernel", _KERNEL_INIT, (27, cin, self.out_channels))
        return pencil_conv_apply(
            core, w, ps, compute_dtype=jnp.dtype(self.conv_dtype)
        )


class PencilSubMConv(nn.Module):
    """Single submanifold conv on the pencil engine (flat in/out).
    Same param tree as :class:`SubMConv` (a bare ``kernel``)."""

    out_channels: int
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, feats, ps: PencilStructure, valid):
        w = self.param(
            "kernel", _KERNEL_INIT, (27, feats.shape[-1], self.out_channels)
        )
        core = to_pencil(feats * valid[:, None], ps)
        out = pencil_conv_apply(
            core, w, ps, compute_dtype=jnp.dtype(self.conv_dtype)
        )
        return from_pencil(out, ps) * valid[:, None]


class PencilResidualBlock(nn.Module):
    """ResidualBlock on the pencil layout (same math, banded MXU conv).
    Submodule instantiation order matches :class:`ResidualBlock` exactly,
    so auto-naming yields the same param/batch-stats tree."""

    out_channels: int
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, core, ps: PencilStructure, flat_mask, train: bool):
        cap1 = core.shape[0]
        cells = ps.cell_active.shape[1]
        cin = core.shape[1] // cells
        if cin == self.out_channels:
            identity = core
        else:
            w = self.param(
                "shortcut", _KERNEL_INIT, (cin, self.out_channels)
            )
            identity = jnp.dot(
                core.reshape(-1, cin), w, preferred_element_type=jnp.float32
            ).reshape(cap1, -1)

        def bn_relu(x):
            c = x.shape[1] // cells
            flat = x.reshape(-1, c)
            flat = MaskedBatchNorm()(flat, flat_mask, train)
            return nn.relu(flat).reshape(cap1, -1)

        x = bn_relu(core)
        x = PencilCoreConv(self.out_channels, self.conv_dtype,
                           name="SubMConv_0")(x, ps)
        x = bn_relu(x)
        x = PencilCoreConv(self.out_channels, self.conv_dtype,
                           name="SubMConv_1")(x, ps)
        return x + identity


class BrickSubMConv(nn.Module):
    """Single submanifold conv on the brick engine (flat in/out)."""

    out_channels: int
    impl: str = "conv"
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, feats, bs: BrickStructure, active, valid):
        w = self.param(
            "kernel", _KERNEL_INIT, (27, feats.shape[-1], self.out_channels)
        )
        dense = to_dense(feats * valid[:, None], bs)
        out = brick_subm_conv(
            dense, w, bs, active, impl=self.impl,
            compute_dtype=jnp.dtype(self.conv_dtype),
        )
        return from_dense(out, bs) * valid[:, None]


class BrickResidualBlock(nn.Module):
    """ResidualBlock on the dense-brick layout (same math, MXU conv)."""

    out_channels: int
    impl: str = "conv"
    conv_dtype: str = "float32"

    @nn.compact
    def __call__(self, dense, bs: BrickStructure, active, flat_mask,
                 train: bool):
        cin = dense.shape[-1]
        shape = dense.shape
        if cin == self.out_channels:
            identity = dense
        else:
            w = self.param(
                "shortcut", _KERNEL_INIT, (cin, self.out_channels)
            )
            identity = jnp.dot(
                dense.reshape(-1, cin), w, preferred_element_type=jnp.float32
            ).reshape(*shape[:-1], self.out_channels)

        def bn_relu(x, name):
            flat = x.reshape(-1, x.shape[-1])
            flat = MaskedBatchNorm(name=name)(flat, flat_mask, train)
            return nn.relu(flat).reshape(x.shape) * active

        x = bn_relu(dense, "bn0")
        w0 = self.param(
            "conv0", _KERNEL_INIT, (27, cin, self.out_channels)
        )
        dtype = jnp.dtype(self.conv_dtype)
        x = brick_subm_conv(x, w0, bs, active, impl=self.impl,
                            compute_dtype=dtype)
        x = bn_relu(x, "bn1")
        w1 = self.param(
            "conv1", _KERNEL_INIT, (27, self.out_channels, self.out_channels)
        )
        x = brick_subm_conv(x, w1, bs, active, impl=self.impl,
                            compute_dtype=dtype)
        return x + identity


class UBlock(nn.Module):
    """Recursive U-Net over voxel levels (reference blocks.py:83-151).

    ``level_shrink`` halves (by default) the static capacity of each
    coarser level — real clouds coarsen >=2x per stride-2 level, and the
    sparse engine's gather costs scale with the padded size. Set 1 to
    disable compaction.

    ``engine``: 'gather' = hash-rulebook gather-matmul convs;
    'pencil' = z-pencil rows, 9 big-row gathers + banded MXU matmuls
    (ops/pencil.py — the fast path, ~2x the gather conv with 13.5x fewer
    rulebook lookups); 'brick' = dense 4x4x4-brick convs (ops/bricks.py).
    ``pencil_divisor`` / ``brick_divisor`` statically cap the pencil /
    brick count at M/divisor (z-pencils hold up to 16 voxels; tree
    surfaces average ~3-8, so 2 is safe in practice; 1 is always safe).
    Overflow is counted in the structure, surfaced via model outputs.
    """

    n_planes: Sequence[int]
    block_reps: int = 2
    kernel_size: int = 3
    level_shrink: int = 2
    min_capacity: int = 256
    engine: str = "gather"
    brick_divisor: int = 4
    pencil_divisor: int = 1
    pencil_cells: int = 4
    conv_dtype: str = "float32"
    verify_coords: bool = False
    brick_impl: str = "conv"  # 'conv' (lax.conv) | 'xslab' (banded matmuls)

    def _make_ctx(self, coords, valid):
        """Per-level conv context, shared by head and tail blocks (the
        reference's indice_key reuse). Returns (ctx, dropped) where
        ``dropped`` counts voxels lost to the engine's static caps."""
        if self.engine == "pencil" and self.kernel_size == 3:
            m = coords.shape[0]
            cap = max(3 * m // self.pencil_divisor, 64)
            ps = build_pencils(
                coords, valid, cap, cells=self.pencil_cells,
                verify_coords=self.verify_coords,
            )
            flat_mask = ps.cell_active.reshape(-1) > 0
            return ("pencil", ps, flat_mask), ps.overflow
        if self.engine == "zpack" and self.kernel_size == 3:
            # same gather-path blocks; subm_conv_apply dispatches ZPlan
            plan = build_zplan(
                coords, valid, 3, verify_coords=self.verify_coords
            )
            return ("gather", plan), jnp.int32(0)
        if self.engine == "band":
            # banded one-hot Pallas conv (ops/bandconv.py); same blocks,
            # subm_conv_apply dispatches on the plan type. Widest conv at
            # this level is the tail block's first (2C -> C after the
            # skip concat), which sizes the plan's VMEM viability.
            rb = build_rulebook(
                coords, valid, self.kernel_size,
                verify_coords=self.verify_coords,
            )
            plan = choose_band_plan(
                rb, valid, 2 * self.n_planes[0], self.n_planes[0],
                self.conv_dtype,
            )
            return ("gather", plan), jnp.int32(0)
        if self.engine == "brick" and self.kernel_size == 3:
            m = coords.shape[0]
            cap = max(m // self.brick_divisor, 64)
            bs = brickize(coords, valid, cap)
            active = to_dense(valid.astype(jnp.float32)[:, None], bs)
            flat_mask = (active > 0).reshape(-1)
            dropped = jnp.sum(valid & (bs.brick_id >= cap)).astype(jnp.int32)
            return ("brick", bs, active, flat_mask), dropped
        ctx = (
            "gather",
            build_rulebook(
                coords, valid, self.kernel_size,
                verify_coords=self.verify_coords,
            ),
        )
        return ctx, jnp.int32(0)

    def _run_blocks(self, x, ctx, valid, train, prefix: str):
        if ctx[0] == "pencil":
            _, ps, flat_mask = ctx
            core = to_pencil(x * valid[:, None], ps)
            for i in range(self.block_reps):
                core = PencilResidualBlock(
                    self.n_planes[0], self.conv_dtype, name=f"{prefix}{i}"
                )(core, ps, flat_mask, train)
            return from_pencil(core, ps) * valid[:, None]
        if ctx[0] == "brick":
            _, bs, active, flat_mask = ctx
            dense = to_dense(x * valid[:, None], bs)
            for i in range(self.block_reps):
                dense = BrickResidualBlock(
                    self.n_planes[0], self.brick_impl, self.conv_dtype,
                    name=f"{prefix}{i}"
                )(dense, bs, active, flat_mask, train)
            return from_dense(dense, bs) * valid[:, None]
        rulebook = ctx[1]
        for i in range(self.block_reps):
            x = ResidualBlock(
                self.n_planes[0],
                self.kernel_size,
                self.conv_dtype,
                name=f"{prefix}{i}",
            )(x, rulebook, valid, train)
        return x

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool):
        """Returns (features, dropped) — ``dropped`` totals the voxels
        lost to static caps across this and all coarser levels."""
        ctx, dropped = self._make_ctx(coords, valid)
        x = self._run_blocks(feats, ctx, valid, train, "block")

        if len(self.n_planes) > 1:
            identity = x

            d = MaskedBatchNorm()(x, valid, train)
            d = nn.relu(d)
            cap = max(
                coords.shape[0] // self.level_shrink, self.min_capacity
            )
            cap = min(cap, coords.shape[0])
            ds: DownsampleMap = build_downsample(coords, valid, cap)
            w_down = self.param(
                "down_kernel",
                _KERNEL_INIT,
                (8, self.n_planes[0], self.n_planes[1]),
            )
            d = down_conv_apply(
                d, w_down, ds, valid,
                compute_dtype=jnp.dtype(self.conv_dtype),
            )
            dropped = dropped + jnp.sum(
                valid & (ds.parent >= cap)
            ).astype(jnp.int32)

            d, d_dropped = UBlock(
                self.n_planes[1:],
                self.block_reps,
                self.kernel_size,
                self.level_shrink,
                self.min_capacity,
                self.engine,
                self.brick_divisor,
                self.pencil_divisor,
                self.pencil_cells,
                self.conv_dtype,
                self.verify_coords,
                brick_impl=self.brick_impl,
                name="u",
            )(d, ds.coarse_coords, ds.coarse_valid, train)
            dropped = dropped + d_dropped

            u = MaskedBatchNorm()(d, ds.coarse_valid, train)
            u = nn.relu(u)
            w_up = self.param(
                "up_kernel",
                _KERNEL_INIT,
                (8, self.n_planes[1], self.n_planes[0]),
            )
            u = inverse_conv_apply(
                u, w_up, ds, valid,
                compute_dtype=jnp.dtype(self.conv_dtype),
            )

            x = jnp.concatenate([identity, u], axis=-1)
            x = self._run_blocks(x, ctx, valid, train, "tail")
        return x, dropped


class MLPHead(nn.Module):
    """Linear/BN/ReLU head with a small-variance final layer
    (reference TreeLearn/blocks.py:10-28)."""

    out_channels: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, mask, train: bool):
        for _ in range(self.num_layers - 1):
            x = nn.Dense(
                x.shape[-1], kernel_init=nn.initializers.xavier_uniform()
            )(x)
            x = MaskedBatchNorm()(x, mask, train)
            x = nn.relu(x)
        return nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
        )(x)


class TreeLearnBackbone(nn.Module):
    """Voxelize -> sparse U-Net -> per-point features.

    ``voxel_capacity_divisor`` statically bounds the voxel arrays at
    P / divisor: dense (e.g. upsampled) clouds put many points per voxel
    and every sparse-engine cost scales with the padded voxel count.
    Overflow voxels (only if real voxel count exceeds the bound) are
    dropped and masked.
    """

    channels: int = 32
    num_blocks: int = 7
    kernel_size: int = 3
    use_feats: bool = True
    use_coords: bool = False
    voxel_size: float = 0.1
    batch_size: int = 1  # static batch element count
    voxel_capacity_divisor: int = 1
    #: 'pencil' (fast), 'zpack' (banded z-pack rows, no pencil padding),
    #: 'brick', or 'gather'
    engine: str = "gather"
    brick_divisor: int = 4
    pencil_divisor: int = 1
    pencil_cells: int = 4
    conv_dtype: str = "float32"  # bfloat16: ~5x faster convs, f32 accum
    verify_coords: bool = False  # exact (collision-proof) hash lookups
    brick_impl: str = "conv"  # brick engine conv schedule ('conv'|'xslab')
    #: absolute level-0 voxel capacity override: callers that know the
    #: batch's true unique-voxel count (host-side dedup, bucketed like
    #: n_points) can bound the static arrays tighter than any P/divisor
    #: rule — sparse low-duplication clouds sit between divisor 1 and 2
    voxel_capacity: int | None = None

    @nn.compact
    def __call__(self, coords, feats, batch_ids, valid, train: bool):
        capacity = self.voxel_capacity or max(
            coords.shape[0] // self.voxel_capacity_divisor, 256
        )
        vox = voxelize_treelearn_features(
            coords,
            feats,
            batch_ids,
            valid,
            self.voxel_size,
            self.batch_size,
            use_coords=self.use_coords,
            use_feats=self.use_feats,
            capacity=min(capacity, coords.shape[0]),
        )
        v_coords = vox.voxel_coords
        v_valid = vox.voxel_valid

        if self.engine == "pencil" and self.kernel_size == 3:
            m = v_coords.shape[0]
            pcap = max(3 * m // self.pencil_divisor, 64)
            ps = build_pencils(
                v_coords, v_valid, pcap, cells=self.pencil_cells,
                verify_coords=self.verify_coords,
            )
            x = PencilSubMConv(
                self.channels, self.conv_dtype, name="input_conv"
            )(vox.voxel_feats, ps, v_valid)
        elif self.engine == "brick" and self.kernel_size == 3:
            m = v_coords.shape[0]
            bcap = max(m // self.brick_divisor, 64)
            bs = brickize(v_coords, v_valid, bcap)
            active = to_dense(v_valid.astype(jnp.float32)[:, None], bs)
            x = BrickSubMConv(
                self.channels, self.brick_impl, self.conv_dtype,
                name="input_conv",
            )(vox.voxel_feats, bs, active, v_valid)
        else:
            if self.engine == "zpack" and self.kernel_size == 3:
                rulebook = build_zplan(
                    v_coords, v_valid, 3,
                    verify_coords=self.verify_coords,
                )
            elif self.engine == "band":
                rulebook = choose_band_plan(
                    build_rulebook(
                        v_coords, v_valid, self.kernel_size,
                        verify_coords=self.verify_coords,
                    ),
                    v_valid,
                    vox.voxel_feats.shape[-1],
                    self.channels,
                    self.conv_dtype,
                )
            else:
                rulebook = build_rulebook(
                    v_coords, v_valid, self.kernel_size,
                    verify_coords=self.verify_coords,
                )
            x = SubMConv(
                self.channels,
                self.kernel_size,
                self.conv_dtype,
                needs_feats_grad=False,  # voxel feats are raw data
                name="input_conv",
            )(vox.voxel_feats, rulebook, v_valid)
        n_planes = [self.channels * (i + 1) for i in range(self.num_blocks)]
        x, dropped_voxels = UBlock(
            n_planes,
            2,
            self.kernel_size,
            engine=self.engine,
            brick_divisor=self.brick_divisor,
            pencil_divisor=self.pencil_divisor,
            pencil_cells=self.pencil_cells,
            conv_dtype=self.conv_dtype,
            verify_coords=self.verify_coords,
            brick_impl=self.brick_impl,
            name="unet",
        )(x, v_coords, v_valid, train)
        x = MaskedBatchNorm(name="output_norm")(x, v_valid, train)
        x = nn.relu(x)

        # voxel -> point unprojection (reference forward_head,
        # TreeLearn.py:132-144); p2v == capacity marks overflow points
        cap = vox.voxel_feats.shape[0]
        p2v = vox.point_to_voxel
        in_range = p2v < cap
        dropped_points = jnp.sum(valid & ~in_range).astype(jnp.int32)
        point_feats = x[jnp.clip(p2v, 0, cap - 1)] * (
            valid & in_range
        )[:, None]
        return point_feats, vox, dropped_points, dropped_voxels


class TreeLearn(nn.Module):
    """Sparse U-Net backbone + per-point heads.

    Input is the flat voxel-model layout: (P,) concatenated clouds with
    batch ids and validity. Returns per-point predictions (padding rows
    zeroed). When a separate synthetic noise cloud is given, the semantic
    head reads a second backbone pass over it with shared weights
    (reference TreeLearn.py:98-105, 137-141).
    """

    channels: int = 32
    num_blocks: int = 7
    kernel_size: int = 3
    dim_feat: int = 1
    use_feats: bool = True
    use_coords: bool = False
    voxel_size: float = 0.1
    batch_size: int = 1  # static batch element count
    voxel_capacity_divisor: int = 1
    engine: str = "gather"  # 'pencil' (fast), 'brick', or 'gather'
    brick_divisor: int = 4
    pencil_divisor: int = 1
    pencil_cells: int = 4
    conv_dtype: str = "float32"
    verify_coords: bool = False
    brick_impl: str = "conv"
    voxel_capacity: int | None = None  # absolute L0 cap (see backbone)

    @nn.compact
    def __call__(
        self,
        coords: jax.Array,  # (P, 3) float32
        feats: jax.Array,  # (P, F) float32
        batch_ids: jax.Array,  # (P,) int32
        valid: jax.Array,  # (P,) bool
        train: bool = False,
        noise_coords: jax.Array | None = None,
        noise_feats: jax.Array | None = None,
        noise_batch_ids: jax.Array | None = None,
        noise_valid: jax.Array | None = None,
    ) -> dict:
        backbone = TreeLearnBackbone(
            channels=self.channels,
            num_blocks=self.num_blocks,
            kernel_size=self.kernel_size,
            use_feats=self.use_feats,
            use_coords=self.use_coords,
            voxel_size=self.voxel_size,
            batch_size=self.batch_size,
            voxel_capacity_divisor=self.voxel_capacity_divisor,
            engine=self.engine,
            brick_divisor=self.brick_divisor,
            pencil_divisor=self.pencil_divisor,
            pencil_cells=self.pencil_cells,
            conv_dtype=self.conv_dtype,
            verify_coords=self.verify_coords,
            brick_impl=self.brick_impl,
            voxel_capacity=self.voxel_capacity,
            name="backbone",
        )
        point_feats, vox, dropped_points, dropped_voxels = backbone(
            coords, feats, batch_ids, valid, train
        )

        semantic_head = MLPHead(2, name="semantic_head")
        offset_head = MLPHead(3, name="offset_head")

        if noise_coords is not None:
            noise_point_feats, _, n_dp, n_dv = backbone(
                noise_coords, noise_feats, noise_batch_ids, noise_valid, train
            )
            dropped_points = dropped_points + n_dp
            dropped_voxels = dropped_voxels + n_dv
            sem = semantic_head(noise_point_feats, noise_valid, train)
        else:
            sem = semantic_head(point_feats, valid, train)
        off = offset_head(point_feats, valid, train)
        return {
            "backbone_feats": point_feats,
            "semantic_prediction_logits": sem,
            "offset_predictions": off,
            "point_to_voxel": vox.point_to_voxel,
            "num_voxels": vox.num_voxels,
            # static-cap overflow diagnostics (both 0 in healthy configs):
            # points whose voxel overflowed the voxelizer capacity, and
            # voxels dropped by level caps (downsample/pencil/brick)
            "dropped_points": dropped_points,
            "dropped_voxels": dropped_voxels,
        }


def treelearn_loss(
    output: dict,
    flat_batch: dict,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    n_points: int | None = None,
    rng: jax.Array | None = None,
    axis_name: str | None = None,
):
    """Masked loss over the flat layout (reference TreeLearn.py:147-155)."""
    sem_loss, off_loss = point_wise_loss(
        output["semantic_prediction_logits"],
        output["offset_predictions"],
        flat_batch["semantic_labels"],
        flat_batch["offset_labels"],
        semantic_mask=flat_batch["mask_valid"],
        offset_mask=flat_batch["mask_valid"] & flat_batch["mask_off"],
        n_points=n_points,
        rng=rng,
        axis_name=axis_name,
    )
    loss_dict = {
        "semantic_loss": sem_loss * loss_multiplier_semantic,
        "offset_loss": off_loss * loss_multiplier_offset,
    }
    return sum(loss_dict.values()), loss_dict
