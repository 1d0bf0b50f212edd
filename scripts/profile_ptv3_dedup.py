#!/usr/bin/env python
"""PTv3 forward on the bench workload: dedup_divisor off vs on (real chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.evaluation.model_loaders import build_model
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    n = 131072
    rng = np.random.default_rng(0)
    qsm = synthetic_qsm(rng=rng)
    pts, _ = synthetic_tree_cloud(
        qsm=qsm, points_per_m2=40000, noise_scale=0.004, rng=rng
    )
    reps = -(-n // len(pts))
    pts = np.tile(pts, (reps, 1))[:n] + rng.normal(0, 0.005, (n, 3)).astype(
        np.float32
    )
    coords = jnp.asarray(pts.astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    batch_ids = jnp.zeros(n, jnp.int32)
    valid = jnp.ones(n, bool)

    # measure the dup factor first
    grid = np.floor((pts - pts.min(0)) / 0.02).astype(np.int64)
    uniq = np.unique(grid, axis=0).shape[0]
    print(f"points {n}, unique voxels {uniq}, dup factor {n/uniq:.2f}",
          flush=True)

    for dd in (None, 2, 3, 4):
        model = build_model(
            "pointtransformerv3", pool_shrink=4, dedup_divisor=dd
        )
        variables = jax.jit(
            lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
        )(jax.random.key(0), coords, feats, batch_ids, valid)

        @jax.jit
        def forward(variables, coords, feats, batch_ids, valid):
            out = model.apply(
                variables, coords, feats, batch_ids, valid, train=False
            )
            return out["offset_predictions"], out.get("dedup_overflow", 0)

        out = forward(variables, coords, feats, batch_ids, valid)
        ovf = int(np.asarray(out[1]))
        np.asarray(out[0])
        iters = 5
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [
                forward(variables, coords, feats, batch_ids, valid)
                for _ in range(iters)
            ]
            np.asarray(outs[-1][0]).ravel()[:1]
            np.asarray(outs[0][0]).ravel()[:1]
            best = min(best, (time.perf_counter() - t0) / iters)
        print(
            f"dedup_divisor={dd}: {best*1e3:8.1f} ms/fwd "
            f"({n/best/1e3:,.0f}k pts/s) overflow={ovf}",
            flush=True,
        )


if __name__ == "__main__":
    main()
