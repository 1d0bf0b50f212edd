#!/usr/bin/env python
"""jax.profiler trace of the TreeLearn TRAIN step at the bench shape
(30 trees x 16,384 pts, fwd+bwd+AdamW), mapped to model components via
compiled-HLO metadata — locates the elementwise/optimizer tail VERDICT
r4 #6 targets.

Usage: trace_train.py [engine] [conv_dtype] [filter]
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

    from treemorph_tpu.data import make_padded_batch
    from treemorph_tpu.data.treeset import TreeSample
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn
    from treemorph_tpu.train import create_train_state, make_train_step
    from treemorph_tpu.train.families import init_treelearn, treelearn_family
    from treemorph_tpu.train.harness import make_optimizer

    engine = sys.argv[1] if len(sys.argv) > 1 else "band"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    filt = sys.argv[3] if len(sys.argv) > 3 else None

    trees, n_points = 30, 16384
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(trees):
        qsm = synthetic_qsm(rng=rng)
        pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=4000, rng=rng)
        if len(pts) >= n_points:
            pts = pts[:n_points]
        else:
            reps = -(-n_points // len(pts))
            pts = np.tile(pts, (reps, 1))[:n_points] + rng.normal(
                0, 0.005, (n_points, 3)
            ).astype(np.float32)
        offs = rng.normal(0, 0.02, (n_points, 3)).astype(np.float32)
        norm = np.linalg.norm(offs, axis=1)
        samples.append(TreeSample(
            points=pts,
            feats=rng.normal(size=(n_points, 4)).astype(np.float32),
            offsets=offs,
            semantic_label=(norm > 0.05).astype(np.int32),
            offset_mask=norm <= 0.05,
            path="bench",
        ))
    batch = jax.tree.map(
        jnp.asarray, make_padded_batch(samples, bucket=n_points)
    )

    model = TreeLearn(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
        batch_size=trees, voxel_capacity_divisor=2,
        engine=engine, conv_dtype=dtype,
    )
    variables = init_treelearn(model, batch, jax.random.key(0))
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    train_step = make_train_step(*treelearn_family(model), tx)

    lr = jnp.float32(1e-3)

    compiled = train_step.lower(state, batch, lr, jax.random.key(1)).compile()
    hlo = compiled.as_text()
    op2meta = {}
    for mt in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{([^}]*)\}", hlo
    ):
        name, meta = mt.group(1), mt.group(2)
        om = re.search(r'op_name="([^"]*)"', meta)
        if om:
            op2meta[name] = om.group(1)

    state, metrics = train_step(state, batch, lr, jax.random.key(1))
    float(metrics["loss"])
    iters = 3
    tdir = "/tmp/train_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for i in range(iters):
            state, metrics = train_step(
                state, batch, lr, jax.random.key(2 + i)
            )
        float(metrics["loss"])

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        t = json.load(f)

    pid_names = {}
    for ev in t["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {
        p for p, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "Chip" in name
    } or set(pid_names)

    agg = defaultdict(float)
    raw = defaultdict(float)
    total = 0.0
    for ev in t["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev["name"]
        if name.startswith("jit_train_step") or name.startswith("jit_"):
            continue
        dur = ev.get("dur", 0) / 1e3 / iters
        total += dur
        op = op2meta.get(name, op2meta.get(name.split("(")[0], ""))
        op = re.sub(r"jit\([\w_]+\)/", "", op)
        segs = [s for s in op.split("/") if s]
        key = "/".join(segs[:4]) if segs else f"<unmapped {name[:28]}>"
        agg[key] += dur
        raw[(name, op)] += dur
    print(f"total {total:.1f} ms/iter")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
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
