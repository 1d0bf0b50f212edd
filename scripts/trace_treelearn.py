#!/usr/bin/env python
"""jax.profiler trace of the TreeLearn bench forward, mapped to model
components via compiled-HLO metadata (same method as trace_map_ptv3).

Usage: trace_treelearn.py [engine] [conv_dtype] [filter]
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn

    engine = sys.argv[1] if len(sys.argv) > 1 else "band"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    filt = sys.argv[3] if len(sys.argv) > 3 else None

    b, n = 8, 131072
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
    coords = jnp.asarray(np.concatenate(clouds))
    feats = jnp.asarray(rng.normal(size=(b * n, 4)).astype(np.float32))
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)

    model = TreeLearn(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
        batch_size=b, voxel_capacity_divisor=5, engine=engine,
        conv_dtype=dtype,
    )
    variables = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )(jax.random.key(0), coords, feats, batch_ids, valid)

    @jax.jit
    def forward(variables, coords, feats, batch_ids, valid):
        out = model.apply(
            variables, coords, feats, batch_ids, valid, train=False
        )
        return out["offset_predictions"]

    compiled = forward.lower(
        variables, coords, feats, batch_ids, valid
    ).compile()
    hlo = compiled.as_text()
    op2meta = {}
    for mt in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{([^}]*)\}", hlo
    ):
        name, meta = mt.group(1), mt.group(2)
        om = re.search(r'op_name="([^"]*)"', meta)
        if om:
            op2meta[name] = om.group(1)

    np.asarray(forward(variables, coords, feats, batch_ids, valid))
    tdir = "/tmp/tl_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        outs = [
            forward(variables, coords, feats, batch_ids, valid)
            for _ in range(3)
        ]
        np.asarray(outs[-1]).ravel()[:1]

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        t = json.load(f)

    agg = defaultdict(float)
    raw = defaultdict(float)
    total = 0.0
    for ev in t["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") != 3:
            continue
        name = ev["name"]
        if name.startswith("jit_forward"):
            continue
        dur = ev.get("dur", 0) / 1e3 / 3
        total += dur
        op = op2meta.get(name, op2meta.get(name.split("(")[0], ""))
        op = op.replace("jit(forward)/", "").replace("jit(main)/", "")
        segs = [s for s in op.split("/") if s]
        key = "/".join(segs[:4]) if segs else f"<unmapped {name[:28]}>"
        agg[key] += dur
        raw[(name, op)] += dur
    print(f"total {total:.1f} ms/iter")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.2f} ms  {k[:120]}")
    print("\n--- top raw ops ---")
    for (name, op), v in sorted(raw.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{v:8.2f} ms  {name[:36]:38s} {op[:140]}")
    if filt:
        print(f"\n--- all raw ops matching {filt!r} ---")
        tot = 0.0
        for (name, op), v in sorted(raw.items(), key=lambda kv: -kv[1]):
            if filt in op:
                tot += v
                print(f"{v:8.3f} ms  {name[:36]:38s} {op[:150]}")
        print(f"total {tot:.2f} ms")


if __name__ == "__main__":
    main()
