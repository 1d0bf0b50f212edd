#!/usr/bin/env python
"""Row counts (real + ghost pencils) per CELLS size on the bench levels.

Cost model per conv: t = max(9*rows*r_ns, 9*rows*(cells+2)*C*4 / BW) with
r_ns ~ 2.6 ns/row (measured gather-engine row rate) and BW ~ 132 GB/s
(measured big-row gather bandwidth).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.ops.sparse import build_downsample
    from treemorph_tpu.ops.voxelize import voxelize

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
    feats = jnp.zeros((b * n, 1), jnp.float32)
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)

    vox = voxelize(coords, feats, batch_ids, valid, 0.02, b,
                   capacity=b * n // 4)
    vc, vv = vox.voxel_coords, vox.voxel_valid
    channels = [32, 64, 96]
    for lvl in range(3):
        c = np.asarray(vc)[np.asarray(vv)]
        m = len(c)
        cdim = channels[lvl]
        print(f"L{lvl}: voxels={m} C={cdim}")
        # z-run stats
        cols = c[:, :3]
        order = np.lexsort((c[:, 3], cols[:, 2], cols[:, 1], cols[:, 0]))
        cs = c[order]
        newcol = np.any(np.diff(cs[:, :3], axis=0) != 0, axis=1)
        zgap = np.diff(cs[:, 3]) != 1
        runstart = np.concatenate([[True], newcol | zgap])
        print(f"   z-runs={runstart.sum()} mean_len={m/runstart.sum():.2f}")
        for cells in (2, 4, 8, 16):
            t = cs[:, 3] // cells
            key = np.concatenate([cs[:, :3], t[:, None]], axis=1)
            newp = np.concatenate(
                [[True], np.any(np.diff(key, axis=0) != 0, axis=1)]
            )
            real = newp.sum()
            pk = key[newp]
            pset = set(map(tuple, pk))
            ghosts = len(
                {(a, b_, c_, tt + d) for a, b_, c_, tt in pset
                 for d in (-1, 1) if tt + d >= 0} - pset
            )
            rows = real + ghosts
            byts = 9 * rows * (cells + 2) * cdim * 4
            t_row = 9 * rows * 2.6e-9 * 1e3
            t_bw = byts / 132e9 * 1e3
            gather27 = 27 * m * 2.6e-9 * 1e3
            print(
                f"   cells={cells:2d}: real={real} ghosts={ghosts} "
                f"rows={rows} fill={m/rows:.2f} "
                f"model={max(t_row, t_bw):.1f}ms (row {t_row:.1f} / "
                f"bw {t_bw:.1f})  vs gather27 {gather27:.1f}ms"
            )
        ds = build_downsample(vc, vv, max(vc.shape[0] // 2, 256))
        vc, vv = ds.coarse_coords, ds.coarse_valid


if __name__ == "__main__":
    main()
