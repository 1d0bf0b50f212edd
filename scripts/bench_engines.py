#!/usr/bin/env python
"""Compare TreeLearn conv engines (gather vs pencil) on the bench workload.

Also reports pencil row counts / overflow at several ``pencil_divisor``
values so the static caps can be sized from data.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn

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

    # pencil fill diagnostics on the real voxel levels
    from treemorph_tpu.ops.pencil import build_pencils
    from treemorph_tpu.ops.sparse import build_downsample
    from treemorph_tpu.ops.voxelize import voxelize

    vox = voxelize(coords, feats, batch_ids, valid, 0.02, b,
                   capacity=b * n // 4)
    vc, vv = vox.voxel_coords, vox.voxel_valid
    for lvl in range(3):
        m = vc.shape[0]
        ps = build_pencils(vc, vv, cap=m)
        print(
            f"L{lvl}: voxels={int(jnp.sum(vv))}/{m} "
            f"pencil_rows={int(ps.num_pencils)} overflow={int(ps.overflow)}",
            flush=True,
        )
        ds = build_downsample(vc, vv, max(m // 2, 256))
        vc, vv = ds.coarse_coords, ds.coarse_valid

    def bench(engine, vdiv=5, **kw):
        model = TreeLearn(
            channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
            batch_size=b, voxel_capacity_divisor=vdiv, engine=engine, **kw,
        )
        variables = jax.jit(
            lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
        )(jax.random.key(0), coords, feats, batch_ids, valid)

        @jax.jit
        def forward(variables, coords, feats, batch_ids, valid):
            out = model.apply(variables, coords, feats, batch_ids, valid,
                              train=False)
            return (out["offset_predictions"],
                    out["semantic_prediction_logits"])

        out = forward(variables, coords, feats, batch_ids, valid)
        ref = np.asarray(out[0])
        iters = 10
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [forward(variables, coords, feats, batch_ids, valid)
                    for _ in range(iters)]
            np.asarray(outs[-1][0]).ravel()[:1]
            np.asarray(outs[0][0]).ravel()[:1]
            dts.append(time.perf_counter() - t0)
        dt = min(dts)
        pps = b * n * iters / dt
        print(f"{engine} {kw}: {pps/1e6:.3f}M pts/s  ({dt/iters*1e3:.1f} "
              f"ms/fwd)", flush=True)
        return ref

    ref = bench("gather", vdiv=5)
    got = bench("band", vdiv=5)
    print(f"  band vs gather max|diff| = {np.abs(got - ref).max():.2e}",
          flush=True)
    bench("band", vdiv=5, conv_dtype="bfloat16")
    got = bench("zpack", vdiv=5)
    print(f"  zpack vs gather max|diff| = {np.abs(got - ref).max():.2e}",
          flush=True)
    bench("zpack", vdiv=5, conv_dtype="bfloat16")
    got = bench("pencil", pencil_divisor=4)
    print(f"  pencil(div=4,cells=4) vs gather max|diff| = "
          f"{np.abs(got - ref).max():.2e}", flush=True)
    bench("pencil", pencil_divisor=4, conv_dtype="bfloat16")
    got = bench("brick", brick_impl="xslab")
    print(f"  brick(xslab) vs gather max|diff| = "
          f"{np.abs(got - ref).max():.2e}", flush=True)
    bench("brick", brick_impl="xslab", conv_dtype="bfloat16")


if __name__ == "__main__":
    main()
