#!/usr/bin/env python
"""RunTable (octant-run rulebook) vs bucket VoxelTable on the chip.

Hypothesis: rulebook construction is latency-bound on per-voxel bucket
row gathers — (k^3 - 1) 128 B rows per voxel.  The octant-run table
answers a whole (dx, dy) offset column with 2 64 B row gathers, so k=3
should drop from 26 to 18 fetches and k=5 from 124 to 50.  Measures
table build + rulebook build at bench shapes, both engines, both
exactness modes.
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
    print(f"{name:56s} {best:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.ops.sparse import (
        build_rulebook,
        build_run_table,
        build_table,
        dedup_sort_perm,
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
    cap = b * n // 5

    vox = jax.jit(
        lambda c, f, bi, v: voxelize_treelearn_features(
            c, f, bi, v, 0.02, b, capacity=cap
        )
    )(coords, feats, batch_ids, valid)
    vc, vv = vox.voxel_coords, vox.voxel_valid
    m = int(np.asarray(jnp.sum(vv)))
    print(f"voxels: {m} valid of cap {vc.shape[0]}", flush=True)

    for k in (3, 5):
        for verify in (False, True):
            tag = "verify" if verify else "prob"
            bt_fn = jax.jit(lambda c, v: build_table(c, v))
            bt = timeit(f"k={k} {tag}: build_table (bucket)", bt_fn, vc, vv)
            rb_fn = jax.jit(
                lambda c, v, t: build_rulebook(
                    c, v, k, verify_coords=verify, table=t
                ),
            )
            want = timeit(
                f"k={k} {tag}: rulebook via bucket table", rb_fn, vc, vv, bt
            )

            rt_fn = jax.jit(lambda c, v: build_run_table(c, v))
            rt = timeit(f"k={k} {tag}: build_run_table", rt_fn, vc, vv)
            rbr_fn = jax.jit(
                lambda c, v, t: build_rulebook(
                    c, v, k, verify_coords=verify, table=t
                ),
            )
            got = timeit(
                f"k={k} {tag}: rulebook via run table", rbr_fn, vc, vv, rt
            )
            same = bool(jnp.all(want == got))
            print(f"  identical rulebooks: {same}", flush=True)


if __name__ == "__main__":
    main()
