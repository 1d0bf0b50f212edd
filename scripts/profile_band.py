#!/usr/bin/env python
"""Stage timing of the TreeLearn band engine at bench shapes.

Isolates: voxelize, rulebook build, band-plan build, banded conv
(f32-split vs bf16) per level, and the full band forward — to find
what stands between the current number and 5M pts/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync_scalar(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync_scalar(out)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        _sync_scalar(outs[-1])
        _sync_scalar(outs[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:52s} {best:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn
    from treemorph_tpu.ops.bandconv import (
        band_subm_conv_apply,
        build_band_plan,
    )
    from treemorph_tpu.ops.sparse import (
        build_downsample,
        build_rulebook,
        subm_conv_apply,
    )
    from treemorph_tpu.ops.voxelize import voxelize_treelearn_features

    b, n = 8, 131072
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(b):
        qsm = synthetic_qsm(rng=rng)
        pts, _ = synthetic_tree_cloud(
            qsm=qsm, points_per_m2=40000, noise_scale=0.004, rng=rng
        )
        if len(pts) >= n:
            pts = pts[:n]
        else:
            reps = -(-n // len(pts))
            pts = np.tile(pts, (reps, 1))[:n] + rng.normal(
                0, 0.005, (n, 3)
            ).astype(np.float32)
        clouds.append(pts)
    coords = jnp.asarray(np.concatenate(clouds))
    feats = jnp.asarray(rng.normal(size=(b * n, 4)).astype(np.float32))
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)
    print("data ready", flush=True)

    cap = b * n // 5  # bench divisor 5

    vox_fn = jax.jit(
        lambda c, f, bi, v: voxelize_treelearn_features(
            c, f, bi, v, 0.02, b, capacity=cap
        )
    )
    vox = timeit("voxelize 1.05M -> cap 209k", vox_fn, coords, feats,
                 batch_ids, valid)
    levels = [(vox.voxel_coords, vox.voxel_valid)]
    for i in range(2):
        c0, v0 = levels[-1]
        ds = jax.jit(lambda c, v, k: build_downsample(c, v, k),
                     static_argnums=2)(c0, v0, c0.shape[0] // 2)
        levels.append((ds.coarse_coords, ds.coarse_valid))

    for li, (vc, vv) in enumerate(levels):
        m = vc.shape[0]
        rb_fn = jax.jit(lambda c, v: build_rulebook(c, v, 3))
        rb = timeit(f"L{li} build_rulebook k=3 @{m//1000}k", rb_fn, vc, vv)
        plan_fn = jax.jit(lambda r, v: build_band_plan(r, v))
        plan = timeit(f"L{li} build_band_plan @{m//1000}k", plan_fn, rb, vv)
        c = 32 * (li + 1)
        f = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
        )
        conv_g = jax.jit(
            lambda f, w, rb, v: subm_conv_apply(
                f, w, rb, v, compute_dtype=jnp.bfloat16
            )
        )
        timeit(f"L{li} gather conv bf16 C={c} @{m//1000}k", conv_g, f, w,
               rb, vv)
        conv_b = jax.jit(
            lambda f, w, p, v: band_subm_conv_apply(
                f, w, p, v, compute_dtype=jnp.bfloat16
            )
        )
        timeit(f"L{li} band conv bf16 C={c} @{m//1000}k", conv_b, f, w,
               plan, vv)
        conv_b32 = jax.jit(
            lambda f, w, p, v: band_subm_conv_apply(f, w, p, v)
        )
        timeit(f"L{li} band conv f32split C={c} @{m//1000}k", conv_b32, f,
               w, plan, vv)

    model = TreeLearn(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
        batch_size=b, voxel_capacity_divisor=5, engine="band",
        conv_dtype="bfloat16",
    )
    init = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )
    variables = init(jax.random.key(0), coords, feats, batch_ids, valid)

    @jax.jit
    def forward(variables, coords, feats, batch_ids, valid):
        out = model.apply(variables, coords, feats, batch_ids, valid,
                          train=False)
        return out["offset_predictions"], out["semantic_prediction_logits"]

    timeit("FULL band bf16 forward (bench workload)", forward, variables,
           coords, feats, batch_ids, valid, iters=5)


if __name__ == "__main__":
    main()
