#!/usr/bin/env python
"""Why did e2e_upsample_seconds hit 174 s post-warm in BENCH?

Times upsample_device end-to-end twice (cold, warm), then the inner
jit alone, then the host->device transfer and fetch separately.
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
    from treemorph_tpu.pipeline.upsample import (
        _device_upsample_rounds,
        upsample_device,
    )

    rng = np.random.default_rng(17)
    qsm = synthetic_qsm(n_branches=4, rng=rng)
    points, _ = synthetic_tree_cloud(
        qsm=qsm, points_per_m2=50000, noise_scale=0.004,
        outlier_fraction=0.02, rng=rng,
    )
    print(f"raw points: {len(points)}", flush=True)

    for tag in ("cold", "warm", "warm2"):
        t0 = time.perf_counter()
        out = upsample_device(points, min_points=1_000_000)
        t1 = time.perf_counter()
        print(f"upsample_device {tag}: {t1 - t0:.2f} s -> {len(out)} pts",
              flush=True)

    # inner jit alone at the same shapes
    pts = np.asarray(points, np.float32)[:, :3]
    n0 = len(pts)
    bucket = 8192
    qp = -(-n0 // bucket) * bucket
    queries = np.zeros((qp, 3), np.float32)
    queries[:n0] = pts
    q_valid = np.arange(qp) < n0
    needed, count = 0, n0
    while count < 1_000_000:
        count += n0
        needed += 1
    ks = tuple(min(10 * (2**i), n0 - 1) for i in range(min(10, needed)))
    print(f"ks={ks} qp={qp}", flush=True)

    qj = jnp.asarray(queries)
    vj = jnp.asarray(q_valid)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    mids, ok = _device_upsample_rounds(qj, vj, key, ks)
    mids.block_until_ready()
    t1 = time.perf_counter()
    print(f"inner jit (cached compile): {t1 - t0:.2f} s", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        mids, ok = _device_upsample_rounds(qj, vj, key, ks)
        mids.block_until_ready()
        t1 = time.perf_counter()
        print(f"inner jit dispatch {i}: {t1 - t0:.3f} s", flush=True)
    t0 = time.perf_counter()
    m = np.asarray(mids)
    o = np.asarray(ok)
    t1 = time.perf_counter()
    print(f"fetch {m.nbytes + o.nbytes} B: {t1 - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
