"""Benchmark: flagship-model inference throughput (points/sec/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (see BASELINE.md): the reference publishes only training
epoch times (TreeLearn 12.96 s/epoch at 30 trees/batch on an unstated single
GPU, ``Plotting/computational_expenses.py``). The driver's north star is
inference points/sec/chip at >10x the reference GPU. We estimate the
reference GPU's inference throughput at ~1e6 points/sec (13M-ish points per
TreeLearn epoch / ~13 s, and typical spconv single-GPU forward rates for
20k-100k-point trees); ``vs_baseline`` is ours / that estimate. The estimate
is documented rather than measured because the reference repo ships no
inference benchmark.
"""

import json
import time

import numpy as np

REFERENCE_POINTS_PER_SEC_EST = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    from treemorph_tpu.models import PointNet2

    # Raster-style inference workload: 60 rasters x 4096 points (the
    # reference's PointNet2 inference minibatch shape, ModelPredicting.py
    # uses 60-raster minibatches of 1m rasters).
    b, n = 60, 4096
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.uniform(0, 1, (b, n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32))
    valid = jnp.ones((b, n), bool)

    model = PointNet2(depth=5)
    init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=False))
    variables = init(jax.random.key(0), coords, feats, valid)

    @jax.jit
    def forward(variables, coords, feats, valid):
        out = model.apply(variables, coords, feats, valid, train=False)
        return out["offset_predictions"], out["semantic_prediction_logits"]

    # compile + warmup
    jax.block_until_ready(forward(variables, coords, feats, valid))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, coords, feats, valid)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    points_per_sec = b * n * iters / dt
    print(
        json.dumps(
            {
                "metric": "pointnet2_inference_points_per_sec_per_chip",
                "value": round(points_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(
                    points_per_sec / REFERENCE_POINTS_PER_SEC_EST, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
