#!/usr/bin/env python
"""Host-side: pencil/brick occupancy statistics on the bench workload.

Decides the dense-group layout for the conv engine redesign: a gathered
row costs ~flat time regardless of size, so grouping G voxels per row
divides conv gather rows by G*fill. Reports fill for z-pencils (1x1xL)
and bricks at each UNet level of the bench clouds.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(key4, name):
    n = len(key4)
    for kind, div in (
        ("pencil8", (1, 1, 8)),
        ("pencil16", (1, 1, 16)),
        ("pencil32", (1, 1, 32)),
        ("brick4", (4, 4, 4)),
        ("brick8", (8, 8, 8)),
        ("slab2x2x8", (2, 2, 8)),
        ("slab2x2x16", (2, 2, 16)),
    ):
        gx, gy, gz = div
        g = np.stack(
            [
                key4[:, 0],
                key4[:, 1] // gx,
                key4[:, 2] // gy,
                key4[:, 3] // gz,
            ],
            axis=1,
        )
        ng = len(np.unique(g, axis=0))
        cells = gx * gy * gz
        print(
            f"{name} {kind:11s}: groups {ng:8d}  fill {n / (ng * cells):5.1%}"
            f"  rows/vox@27 {27 * ng / n:5.2f}"
        )


def main():
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

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

    all_keys = []
    for i, pts in enumerate(clouds):
        g = np.floor((pts - pts.min(0)) / 0.02).astype(np.int64)
        k = np.concatenate(
            [np.full((len(g), 1), i, np.int64), g], axis=1
        )
        all_keys.append(k)
    key4 = np.unique(np.concatenate(all_keys), axis=0)
    print("L0 voxels:", len(key4))
    stats(key4, "L0")
    for lvl in (1, 2):
        key4 = np.unique(
            np.concatenate(
                [key4[:, :1], key4[:, 1:] >> 1], axis=1
            ),
            axis=0,
        )
        print(f"L{lvl} voxels:", len(key4))
        stats(key4, f"L{lvl}")


if __name__ == "__main__":
    main()
