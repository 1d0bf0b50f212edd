#!/usr/bin/env python
"""Map the PTv3 trace's HLO op names to jax op paths via compiled HLO
metadata, then print the per-iteration time by model component."""

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

    from treemorph_tpu.evaluation.model_loaders import build_model
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    dd = sys.argv[1] if len(sys.argv) > 1 else "4"
    dd = None if dd == "none" else int(dd)
    engine = sys.argv[2] if len(sys.argv) > 2 else "band"
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

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
        "pointtransformerv3", pool_shrink=4, dedup_divisor=dd,
        stem_engine=engine, compute_dtype=dtype,
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
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{([^}]*)\}", hlo
    ):
        name, meta = m.group(1), m.group(2)
        om = re.search(r'op_name="([^"]*)"', meta)
        if om:
            op2meta[name] = om.group(1)

    files = glob.glob("/tmp/ptv3_trace/**/*.trace.json.gz", recursive=True)
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
        key = "/".join(segs[:3]) if segs else f"<unmapped {name[:28]}>"
        agg[key] += dur
        raw[(name, op)] += dur
    print(f"total {total:.1f} ms/iter")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{v:8.2f} ms  {k[:120]}")
    print("\n--- top raw ops (hlo name -> full op path) ---")
    for (name, op), v in sorted(raw.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.2f} ms  {name[:40]:42s} {op[:140]}")


if __name__ == "__main__":
    main()
