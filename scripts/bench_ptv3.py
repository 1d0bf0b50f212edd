#!/usr/bin/env python
"""PTv3 inference micro-benchmark + optional profiler trace.

Measures PointTransformerWithHeads forward points/sec/chip on the same
synthetic dense-tree workload as bench.py (the driver's north-star metric
includes PTv3; VERDICT round-1 missing #5).

Usage: bench_ptv3.py [--points N] [--trees B] [--profile DIR] [--iters K]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_workload(b, n):
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    rng = np.random.default_rng(0)
    clouds = []
    for _ in range(b):
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
    coords = np.concatenate(clouds)
    feats = rng.normal(size=(b * n, 4)).astype(np.float32)
    batch_ids = np.repeat(np.arange(b, dtype=np.int32), n)
    return coords, feats, batch_ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--trees", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--profile", default=None)
    ap.add_argument(
        "--sweep", action="store_true",
        help="compare {gather,zpack,band stem} x {f32,bf16} variants",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.evaluation.model_loaders import build_model

    b, n = args.trees, args.points
    coords, feats, batch_ids = make_workload(b, n)
    coords = jnp.asarray(coords)
    feats = jnp.asarray(feats)
    batch_ids = jnp.asarray(batch_ids)
    valid = jnp.ones(b * n, bool)

    if args.sweep:
        ref = None
        for kw in (
            dict(pool_shrink=4, dedup_divisor=4),
            dict(pool_shrink=4, dedup_divisor=4, stem_engine="zpack"),
            dict(pool_shrink=4, dedup_divisor=4,
                 compute_dtype="bfloat16"),
            dict(pool_shrink=4, dedup_divisor=4, stem_engine="zpack",
                 compute_dtype="bfloat16"),
            dict(pool_shrink=4, dedup_divisor=4, stem_engine="band"),
            dict(pool_shrink=4, dedup_divisor=4, stem_engine="band",
                 compute_dtype="bfloat16"),
        ):
            m = build_model("pointtransformerv3", **kw)
            var = jax.jit(
                lambda r, c, f, bi, v, m=m: m.init(
                    r, c, f, bi, v, train=False
                )
            )(jax.random.key(0), coords, feats, batch_ids, valid)

            fwd = jax.jit(
                lambda var, c, f, bi, v, m=m: m.apply(
                    var, c, f, bi, v, train=False
                )["offset_predictions"]
            )
            out = np.asarray(fwd(var, coords, feats, batch_ids, valid))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fwd(var, coords, feats, batch_ids, valid)
                        for _ in range(args.iters)]
                float(outs[-1][0, 0])
                best = min(best, time.perf_counter() - t0)
            pps = b * n * args.iters / best
            diff = 0.0 if ref is None else float(np.abs(out - ref).max())
            if ref is None:
                ref = out
            print(
                f"{kw}: {pps/1e6:.3f}M pts/s "
                f"({best/args.iters*1e3:.1f} ms) max|diff|={diff:.2e}",
                flush=True,
            )
        return

    model = build_model("pointtransformerv3")
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )(jax.random.key(0), coords, feats, batch_ids, valid)
    print(f"init: {time.perf_counter() - t0:.1f}s")

    @jax.jit
    def forward(variables, coords, feats, batch_ids, valid):
        out = model.apply(
            variables, coords, feats, batch_ids, valid, train=False
        )
        return out["offset_predictions"], out["semantic_prediction_logits"]

    t0 = time.perf_counter()
    out = forward(variables, coords, feats, batch_ids, valid)
    np.asarray(out[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    # async-pipelined: one value fetch at the end (executions are
    # sequential on device; per-iter sync adds ~250 ms tunnel overhead)
    t0 = time.perf_counter()
    outs = [
        forward(variables, coords, feats, batch_ids, valid)
        for _ in range(args.iters)
    ]
    float(outs[-1][0][0, 0])
    dt = time.perf_counter() - t0
    pps = b * n * args.iters / dt
    print(
        f"ptv3 forward: {dt / args.iters * 1e3:.1f} ms/iter, "
        f"{pps:,.0f} points/sec ({b}x{n})"
    )

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(3):
                out = forward(variables, coords, feats, batch_ids, valid)
                float(out[0][0, 0])
        print(f"trace -> {args.profile}")


if __name__ == "__main__":
    main()
