#!/usr/bin/env python
"""jax.profiler trace of the PTv3 bench forward; aggregates TPU op time.

Usage: trace_ptv3.py [dedup_divisor or 'none']
"""

import glob
import gzip
import json
import os
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

    from treemorph_tpu.evaluation.model_loaders import build_model
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    dd = sys.argv[1] if len(sys.argv) > 1 else "4"
    dd = None if dd == "none" else int(dd)
    engine = sys.argv[2] if len(sys.argv) > 2 else "band"
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    tokens = (sys.argv[4] if len(sys.argv) > 4 else "1") == "1"

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

    model = build_model(
        "pointtransformerv3", dedup_divisor=dd,
        stem_engine=engine, compute_dtype=dtype,
        dedup_tokens=tokens, pool_shrink=2 if tokens else 4,
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

    np.asarray(forward(variables, coords, feats, batch_ids, valid))

    tdir = "/tmp/ptv3_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        outs = [
            forward(variables, coords, feats, batch_ids, valid)
            for _ in range(3)
        ]
        np.asarray(outs[-1]).ravel()[:1]

    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # find the TPU pid by name
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {
        p for p, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "Chip" in name
    }
    if not tpu_pids:
        print("pids:", pid_names)
        tpu_pids = set(pid_names)

    agg = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        # bucket by op family
        key = name.split(".")[0].split("(")[0]
        agg[key] += dur
        total += dur
    print(f"total device op time (3 iters): {total:.1f} ms")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v/3:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
