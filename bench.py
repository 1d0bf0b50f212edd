"""Benchmark: stage-1 inference points/sec/chip — TreeLearn (headline)
plus PTv3 (extra keys), both on the same ~1M-point dense-tree workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: one forward pass of the pipeline-configured TreeLearn
(num_blocks=3, voxel 0.02 m, dim_feat=4 — ModelLoaders fixed hyperparams)
over a synthetic ~1M-point tree batch, the stage-1 inference path of the
pipeline (SURVEY.md §3.2).

Baseline derivation (see BASELINE.md): the reference publishes only
training epoch times (TreeLearn 12.96 s/epoch, 30 trees/batch, unstated
single GPU). The driver's north star is inference points/sec/chip at >10x
the reference GPU. We estimate the reference GPU inference throughput at
~1e6 points/sec (a 13 s epoch over a ~100-tree x ~100k-point dataset
implies roughly that forward+backward rate; spconv single-GPU forward rates
on 0.02 m voxel clouds are the same order). ``vs_baseline`` = ours / 1e6.
"""

import argparse
import json
import os
import subprocess
import sys
import time
from functools import partial

import numpy as np


def _device_reachable(timeout: float = 240.0) -> bool:
    """Probe the accelerator backend in a subprocess with a hard timeout.

    The sandbox's TPU rides a network tunnel; when the tunnel is down,
    backend init HANGS (or errors after many minutes). A crashed/hung
    bench records nothing — probing first lets the host-side metrics
    (QSM fit) still be reported with an explicit error marker.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout,
            capture_output=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main(n_devices: int = 1, treelearn_engine: str = "band",
         ptv3_stem_engine: str = "band",
         ptv3_compute_dtype: str = "bfloat16",
         ptv3_dedup_tokens: bool = True,
         treelearn_conv_dtype: str = "bfloat16",
         treelearn_brick_impl: str = "conv"):
    if not _device_reachable():
        qsm_seconds = _bench_qsm()
        print(
            json.dumps(
                {
                    "metric": "treelearn_inference_points_per_sec_per_chip",
                    "value": 0,
                    "unit": "points/sec",
                    "vs_baseline": 0,
                    "error": "accelerator backend unreachable (device "
                    "tunnel down); host-side metrics only",
                    "qsm_fit_seconds_48k_points": round(qsm_seconds, 2),
                    "qsm_vs_reference_fit": round(4.1 / qsm_seconds, 2),
                }
            )
        )
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn

    # Synthetic batch: 8 trees x 131072 points = ~1.05M points, at the
    # density of the pipeline's upsampled clouds (>= 1M points per tree on
    # ~10-20 m^2 of surface, i.e. ~20 points per 2 cm voxel).
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
    coords = jnp.asarray(np.concatenate(clouds))  # (B*N, 3)
    feats = jnp.asarray(
        rng.normal(size=(b * n, 4)).astype(np.float32)
    )
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)

    model = TreeLearn(
        channels=32,
        num_blocks=3,
        dim_feat=4,
        voxel_size=0.02,
        batch_size=b,
        # dense clouds dedupe heavily (measured 187,082 voxels / ~36k
        # bricks for this 1.05M-point batch); bound the static arrays
        # accordingly: divisor 5 keeps 12% headroom at L0 (cap 209,715)
        # and the sparse engines' costs scale with the padded size
        # (measured 1.67 -> 2.37M pts/s going 4 -> 5). Overflow is
        # counted and asserted zero below. Engine comparison on this
        # workload (v5e-1): band+bf16 3.94M, gather 2.93M, pencil
        # (cells=4) 1.92M, brick 1.07M pts/s — the banded one-hot Pallas
        # conv (ops/bandconv.py) is the default; see ROADMAP.md.
        voxel_capacity_divisor=5,
        engine=treelearn_engine,
        # bfloat16 halves the band engine's MXU work (no hi/lo split);
        # offsets move within 3.1e-4 of f32 — well inside the 1e-3
        # parity budget (band+f32split 2.93 -> band+bf16 3.94M pts/s).
        conv_dtype=treelearn_conv_dtype,
        brick_impl=treelearn_brick_impl,
    )
    init = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )
    variables = init(jax.random.key(0), coords, feats, batch_ids, valid)

    def apply_fn(variables, coords, feats, batch_ids, valid):
        out = model.apply(variables, coords, feats, batch_ids, valid,
                          train=False)
        return out["offset_predictions"], out["semantic_prediction_logits"]

    if n_devices > 1:
        # data-parallel inference: whole trees shard over the mesh's data
        # axis (B % n == 0 keeps each shard on tree boundaries); every
        # chip runs the full sparse engine on its local trees, no
        # cross-chip collectives in the forward.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from treemorph_tpu.parallel import make_mesh

        assert b % n_devices == 0, "trees per batch must divide devices"
        mesh = make_mesh(n_devices)
        axis = mesh.axis_names[0]
        forward = jax.jit(
            shard_map(
                apply_fn,
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
                out_specs=(P(axis), P(axis)),
            )
        )
    else:
        forward = jax.jit(apply_fn)

    # compile + warmup; np.asarray forces a real device sync (axon's
    # block_until_ready proved unreliable for timing)
    out = forward(variables, coords, feats, batch_ids, valid)
    np.asarray(out[0])

    # the tuned static caps above must not drop anything on this
    # workload — a dropped voxel would make the speed number fiction
    chk = jax.jit(
        lambda v, c, f, bi, vl: model.apply(v, c, f, bi, vl, train=False)
    )(variables, coords, feats, batch_ids, valid)
    assert int(chk["dropped_points"]) == 0, int(chk["dropped_points"])
    assert int(chk["dropped_voxels"]) == 0, int(chk["dropped_voxels"])

    # async-pipelined timing: dispatch all iterations, fetch one value at
    # the end. The executions run back-to-back on device (total time
    # scales linearly in iters — verified 5 vs 10); a per-iteration
    # float() sync instead adds ~250 ms of axon host-tunnel round trip
    # per iter, which is measurement overhead, not device time.
    # Best-of-3 trials: the axon tunnel shows ~2x run-to-run slowdowns
    # under contention (r02 driver measured 0.96M on code that measures
    # 1.9M here); transient environment noise can only slow a trial down,
    # so the fastest trial is the honest device number.
    # 20 iterations per trial: the axon tunnel charges a fixed
    # ~160-190 ms per trial (final-fetch sync + clock ramp; measured
    # wall/iter falls 96.5 -> 75.5 ms from 5 to 20 iters while Python
    # dispatch is 0.7 ms/iter), so short trials under-report
    # steady-state throughput; the *_device_ms keys report pure device
    # time for comparison
    iters = 20
    tl_trials = [
        _time_trial(forward, iters, variables, coords, feats, batch_ids,
                    valid)
        for _ in range(3)
    ]
    dt = min(tl_trials)

    # one-row engine A/B in the artifact (VERDICT r4 #4): the gather
    # engine on the IDENTICAL workload, so a band-engine regression is
    # distinguishable from host contention in the same JSON. Guarded:
    # its failure must not lose the headline metrics.
    ab = {}
    if n_devices == 1:
        try:
            gmodel = TreeLearn(
                channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
                batch_size=b, voxel_capacity_divisor=5,
                engine="gather", conv_dtype=treelearn_conv_dtype,
            )
            gvars = jax.jit(
                lambda r, c, f, bi, v: gmodel.init(
                    r, c, f, bi, v, train=False
                )
            )(jax.random.key(0), coords, feats, batch_ids, valid)
            gfwd = jax.jit(
                lambda v, c, f, bi, vl: gmodel.apply(
                    v, c, f, bi, vl, train=False
                )["offset_predictions"]
            )
            np.asarray(gfwd(gvars, coords, feats, batch_ids, valid))
            gtrials = [
                _time_trial(gfwd, iters, gvars, coords, feats,
                            batch_ids, valid)
                for _ in range(3)
            ]
            ab = {
                "treelearn_ab_gather_points_per_sec": round(
                    b * n * iters / min(gtrials), 1
                ),
            }
        except Exception as e:  # noqa: BLE001
            ab = {"treelearn_ab_error": f"{type(e).__name__}: {e}"[:160]}

    points_per_sec = b * n * iters / dt

    # roofline accounting (VERDICT r4 missing #1): analytic FLOPs
    # (XLA cost analysis + Pallas trace-time log) / profiler device
    # time / chip bf16 peak. Guarded: MFU is diagnostic, its failure
    # must not lose the headline metrics.
    try:
        from treemorph_tpu.utils.flops import mfu_report

        tl_mfu = mfu_report(
            apply_fn, (variables, coords, feats, batch_ids, valid)
        )
    except Exception as e:  # noqa: BLE001
        tl_mfu = {"error": f"{type(e).__name__}: {e}"[:160]}
    reference_points_per_sec_est = 1.0e6
    # Per-family baseline (VERDICT r3 #3): the reference's own epoch
    # times say PTv3 processes the same per-epoch dataset 39.05/12.96 =
    # 3.01x slower than TreeLearn (computational_expenses.py:10-12), so
    # its honest inference baseline is the TreeLearn estimate / 3.01.
    ptv3_reference_pps = reference_points_per_sec_est * 12.96 / 39.05

    # PTv3 on one 131k-point tree — the workload of the reference's
    # published PTv3 number (README; serialized-attention cost grows
    # superlinearly with cloud size via the per-level sorts, and the
    # pipeline feeds PTv3 per-tree, not the 1M-point batch)
    ptv3_points_per_sec, ptv3_extra = _bench_ptv3(
        coords[:n], feats[:n], batch_ids[:n], valid[:n], 1, n,
        stem_engine=ptv3_stem_engine, compute_dtype=ptv3_compute_dtype,
        dedup_tokens=ptv3_dedup_tokens,
    )

    # stage-3 QSM fit on a ~48k-point synthetic tree: the reference's own
    # fitter (run directly on this machine, torch-cpu) takes 4.1 s on the
    # identical cloud; see README pipeline table.
    qsm_seconds = _bench_qsm()

    # measured machine-local stage-1 anchor (VERDICT r2 item 5): the
    # reference PointNet2 is pure torch, so ITS code runs here (CPU) on
    # the identical batch our PointNet2 processes on the TPU chip.
    pn2 = _bench_pointnet2_anchor()

    # end-to-end per-plot latency (VERDICT r3 #3): one raw cloud through
    # stage1 (offsets+denoise) -> stage2 (upsample to 1M) -> stage3 (QSM
    # fit + CSV) — the wall time the reference logs per cloud
    # (/root/reference/Modules/Pipeline/Pipeline.py:98,173-174).
    e2e = _bench_e2e()

    # one TreeLearn optimizer step (fwd+bwd+AdamW, band+bf16) at the
    # reference's epoch batch shape, 30 trees x 16.4k pts — the ONLY
    # training numbers the reference publishes are epoch times at this
    # shape (computational_expenses.py:10); scripts/bench_training.py
    # carries the per-family version of this measurement.
    # guarded like the pn2 anchor: a failure here (e.g. device OOM at
    # the heavier fwd+bwd workload) must not lose the whole bench JSON
    try:
        trn = _bench_train_step(
            engine=treelearn_engine, conv_dtype=treelearn_conv_dtype,
        )
    except Exception as e:  # noqa: BLE001
        trn = {"treelearn_train_step_error": f"{type(e).__name__}: {e}"[:200]}

    payload = (
            {
                "metric": "treelearn_inference_points_per_sec_per_chip",
                "value": round(points_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(
                    points_per_sec / reference_points_per_sec_est, 3
                ),
                "treelearn_trials_points_per_sec": [
                    round(b * n * iters / t, 1) for t in tl_trials
                ],
                "treelearn_device_ms_per_forward": tl_mfu.get("device_ms"),
                "treelearn_total_flops_per_forward": tl_mfu.get(
                    "total_flops"
                ),
                "mfu_treelearn": tl_mfu.get("mfu", 0.0),
                "treelearn_mfu_error": tl_mfu.get("error"),
                "treelearn_device_points_per_sec": (
                    round(b * n / (tl_mfu["device_ms"] / 1e3), 1)
                    if tl_mfu.get("device_ms")
                    else None
                ),
                "chip_peak_flops_bf16": tl_mfu.get("peak_flops_bf16"),
                "ptv3_points_per_sec": round(ptv3_points_per_sec, 1),
                "ptv3_vs_baseline": round(
                    ptv3_points_per_sec / reference_points_per_sec_est, 3
                ),
                "ptv3_vs_own_baseline": round(
                    ptv3_points_per_sec / ptv3_reference_pps, 3
                ),
                **ptv3_extra,
                **ab,
                "qsm_fit_seconds_48k_points": round(qsm_seconds, 2),
                "qsm_vs_reference_fit": round(4.1 / qsm_seconds, 2),
                **e2e,
                **(trn or {}),
                **(pn2 or {}),
            }
    )
    print(json.dumps({k: v for k, v in payload.items() if v is not None}))


def _time_trial(forward, iters, *args):
    import jax

    t0 = time.perf_counter()
    outs = [forward(*args) for _ in range(iters)]
    first = jax.tree_util.tree_leaves(outs[-1])[0]
    np.asarray(first).ravel()[:1]
    last = jax.tree_util.tree_leaves(outs[0])[0]
    np.asarray(last).ravel()[:1]
    return time.perf_counter() - t0


def _bench_train_step(engine: str = "band", conv_dtype: str = "bfloat16",
                      iters: int = 10):
    """One TreeLearn train step at the reference's epoch batch shape.

    30 trees x 16,384 points, fwd+bwd+AdamW — the batch shape behind the
    reference's 12.96 s/epoch number
    (/root/reference/Plotting/computational_expenses.py:8-10). Returns
    step seconds and training points/sec; per-family versions live in
    scripts/bench_training.py.
    """
    import jax
    import jax.numpy as jnp

    from treemorph_tpu.data import make_padded_batch
    from treemorph_tpu.data.treeset import TreeSample
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn
    from treemorph_tpu.train import create_train_state, make_train_step
    from treemorph_tpu.train.families import init_treelearn, treelearn_family
    from treemorph_tpu.train.harness import make_optimizer

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

    # honest static voxel cap (r4's divisor=2 cap of 245,760 silently
    # dropped ~1/3 of this sparse workload's ~362k unique voxels): the
    # true count is known host-side, so bound the arrays at the real
    # count bucketed to 8k — the droplessness is asserted below
    uniq = 0
    for s in samples:
        g = np.floor(s.points / 0.02).astype(np.int64)
        uniq += len(np.unique(g, axis=0))
    vcap = -(-int(uniq * 1.02) // 8192) * 8192

    model = TreeLearn(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
        batch_size=trees, voxel_capacity=vcap,
        engine=engine, conv_dtype=conv_dtype,
    )
    variables = init_treelearn(model, batch, jax.random.key(0))
    flat = batch.flatten()
    chk = jax.jit(
        lambda v, c, f, bi, vl: model.apply(v, c, f, bi, vl, train=False)
    )(variables, flat["coords"], flat["feats"], flat["batch_ids"],
      flat["mask_valid"])
    assert int(chk["dropped_voxels"]) == 0, int(chk["dropped_voxels"])
    assert int(chk["dropped_points"]) == 0, int(chk["dropped_points"])
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    train_step = make_train_step(*treelearn_family(model), tx)

    lr = jnp.float32(1e-3)
    state, metrics = train_step(state, batch, lr, jax.random.key(1))
    float(metrics["loss"])  # compile + warmup

    # pre-stage the per-step PRNG keys on device, like a real loop
    # stages its batches (measured neutral on this tunnel — key
    # creation overlaps the async step queue — but it keeps the timed
    # region free of host work by construction)
    keys = [jax.device_put(jax.random.key(2 + i)) for i in range(iters)]
    jax.block_until_ready(keys)

    # async-pipelined (steps chain through `state`; see _time_trial)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(state, batch, lr, keys[i])
    float(metrics["loss"])
    step_seconds = (time.perf_counter() - t0) / iters

    # device time per step (profiler module spans): the wall number
    # above carries the tunnel's per-execute dispatch gap, which is
    # measurement environment, not engine cost — report both
    dev_ms = None
    try:
        import shutil
        import tempfile

        from treemorph_tpu.utils.flops import _trace_device_ms

        tdir = tempfile.mkdtemp(prefix="train_trace_")
        try:
            with jax.profiler.trace(tdir):
                for i in range(3):
                    state, metrics = train_step(
                        state, batch, lr, keys[i % iters]
                    )
                jax.block_until_ready(metrics["loss"])
            dev_ms = _trace_device_ms(tdir, 3)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
    except Exception:  # noqa: BLE001 - diagnostic only
        dev_ms = None
    extra = (
        {"treelearn_train_device_seconds": round(dev_ms / 1e3, 4)}
        if dev_ms and np.isfinite(dev_ms)
        else {}
    )
    return {
        "treelearn_train_step_seconds": round(step_seconds, 4),
        **extra,
        "treelearn_train_points_per_sec": round(
            trees * n_points / step_seconds, 1
        ),
        "treelearn_train_batch": f"{trees}x{n_points}",
        # context so the step time is not misread as an epoch ratio
        # (ADVICE r4): the reference's 12.96 s epoch spans an UNSTATED
        # number of 30-tree batches (its trainset size is not in the
        # repo), so no direct step/epoch comparison is possible — the
        # honest cross-framework training comparison is
        # treelearn_train_points_per_sec.
        "reference_treelearn_epoch_seconds_full_epoch_not_one_step": 12.96,
    }


def _bench_e2e(trials: int = 2):
    """Raw ~500k-point cloud -> skeleton CSV, per-stage wall times.

    Stage 1 runs the pipeline-configured TreeLearn (band engine, bf16)
    as both offset and noise model. The noise model's semantic-head
    final bias is set to strongly favor the keep class: a RANDOM-init
    head argmax-drops ~96% of the cloud (VERDICT r4 weak #1), which
    starves stage 2 down to a degenerate ~20k-point workload — nothing
    like the trained reference pipeline, whose stage-1 keeps most
    points (/root/reference/Modules/Pipeline/ModelPredicting.py:68-74).
    Biasing the head reproduces the trained keep-rate while timing the
    exact same forward; voxel_capacity_divisor=2 because the RAW cloud
    is sparser than the upsampled bench batch (dup factor ~2).

    Runs ``trials`` timed passes (after untimed warmup) and reports the
    min per stage plus all per-trial times (VERDICT r4 #4: one
    contended sample can't be told apart from a regression).
    """
    import os
    import tempfile
    import time as _time

    import jax

    from treemorph_tpu.evaluation.model_loaders import (
        Predictor,
        build_model,
    )
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.pipeline.predict import predict_single
    from treemorph_tpu.pipeline.qsm import QSMParams, fit_qsm
    from treemorph_tpu.pipeline.upsample import upsample

    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    qsm = synthetic_qsm(n_branches=4, rng=rng)
    points, _ = synthetic_tree_cloud(
        qsm=qsm, points_per_m2=50000, noise_scale=0.004,
        outlier_fraction=0.02, rng=rng,
    )

    model = build_model(
        "treelearn", voxel_capacity_divisor=2, engine="band",
        conv_dtype="bfloat16",
    )
    n_pad = -(-len(points) // 1024) * 1024
    variables = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )(
        jax.random.key(0),
        jnp.zeros((n_pad, 3)),
        jnp.zeros((n_pad, 4)),
        jnp.zeros(n_pad, jnp.int32),
        jnp.ones(n_pad, bool),
    )
    pred = Predictor("treelearn", model, variables)

    # trained-like noise model: same weights except the semantic head's
    # final bias prefers class 0 (keep); the forward's compute is
    # identical, only the argmax outcome changes.
    noise_vars = jax.tree_util.tree_map(lambda x: x, variables)
    params = jax.device_get(noise_vars["params"])
    params["semantic_head"]["Dense_1"]["bias"] = np.array(
        [5.0, -5.0], np.float32
    )
    noise_vars = dict(noise_vars)
    noise_vars["params"] = params
    noise_pred = Predictor("treelearn", model, noise_vars)

    # warm the jit cache at the exact padded shape: the pipeline
    # processes many clouds per run, so steady-state per-plot latency
    # (compile amortized away) is the comparable number — the reference
    # similarly reuses its loaded models across clouds (Pipeline.py:97)
    pred.predict_flat(
        jnp.zeros((n_pad, 3)), jnp.zeros((n_pad, 4)),
        jnp.zeros(n_pad, jnp.int32), jnp.ones(n_pad, bool),
    )

    # warm the device upsample jit too (one multi-minute compile at this
    # bucketed query shape; steady-state clouds reuse it): run stage
    # 1+2 once untimed, then time the real passes
    warm = upsample(
        predict_single(points, pred, noise_pred), min_points=1_000_000
    )
    assert len(warm) >= 1_000_000, (
        f"stage 2 produced {len(warm)} < 1M points — the e2e workload "
        "has collapsed again (check the noise-head keep rate)"
    )

    stage1_t, ups_t, qsm_t, tot_t = [], [], [], []
    kept = upsampled_n = 0
    for trial in range(trials):
        t0 = _time.perf_counter()
        refined = predict_single(points, pred, noise_pred)
        t1 = _time.perf_counter()
        upsampled = upsample(refined, min_points=1_000_000)
        t2 = _time.perf_counter()
        with tempfile.TemporaryDirectory() as d:
            base = os.path.join(d, "plot")
            fit_qsm(upsampled, params=QSMParams(seed=0), output_base=base,
                    save_csv=True)
            assert os.path.exists(base + "_cylinders.csv")
        t3 = _time.perf_counter()
        stage1_t.append(round(t1 - t0, 2))
        ups_t.append(round(t2 - t1, 2))
        qsm_t.append(round(t3 - t2, 2))
        tot_t.append(round(t3 - t0, 2))
        kept, upsampled_n = len(refined), len(upsampled)

    return {
        "e2e_plot_seconds": min(tot_t),
        "e2e_raw_points": len(points),
        "e2e_stage1_kept_points": kept,
        "e2e_upsampled_points": upsampled_n,
        "e2e_stage1_seconds": min(stage1_t),
        "e2e_upsample_seconds": min(ups_t),
        "e2e_qsm_seconds": min(qsm_t),
        "e2e_trials": {
            "stage1": stage1_t, "upsample": ups_t, "qsm": qsm_t,
            "total": tot_t,
        },
    }


def _bench_qsm():
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.pipeline.qsm import QSMParams, fit_qsm

    rng = np.random.default_rng(11)
    qsm = synthetic_qsm(n_branches=3, rng=rng)
    points, _ = synthetic_tree_cloud(
        qsm=qsm, points_per_m2=5000, noise_scale=0.004,
        outlier_fraction=0.0, rng=rng,
    )
    t0 = time.perf_counter()
    fit_qsm(points, params=QSMParams(seed=0))
    return time.perf_counter() - t0


def _bench_pointnet2_anchor():
    """Reference PointNet2 (its own torch code, CPU) vs ours (TPU) on an
    identical depth-5 batch — a fully measured, machine-local stage-1
    ratio complementing the estimated GPU baseline. Returns a dict of
    bench keys, or None if the reference tree is unavailable."""
    import sys
    import types

    try:
        import torch

        if "fastprogress" not in sys.modules:
            fp = types.ModuleType("fastprogress")
            fp.progress_bar = lambda it, parent=None: it
            fp.master_bar = lambda it: it
            sys.modules["fastprogress"] = fp
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from Modules.PointNet2.PointNet2 import PointNet2 as RefPN2
    except Exception:
        return None

    import jax
    import jax.numpy as jnp

    from treemorph_tpu.models import PointNet2

    b, n = 2, 2048
    rng = np.random.default_rng(7)
    coords = rng.normal(size=(b, n, 3)).astype(np.float32)
    feats = rng.normal(size=(b, n, 4)).astype(np.float32)

    torch.manual_seed(0)
    ref = RefPN2(depth=5, dim_feat=4, use_coords=True, use_features=True)
    ref.eval()
    tc = torch.tensor(coords).permute(0, 2, 1)
    tf = torch.tensor(feats).permute(0, 2, 1)

    def ref_forward():
        with torch.no_grad():
            bb = ref.forward_backbone.__wrapped__(ref, coords=tc, feats=tf)
            return ref.offset_linear(bb)

    ref_forward()  # warmup
    iters_ref = 3
    t0 = time.perf_counter()
    for _ in range(iters_ref):
        ref_forward()
    ref_pps = b * n * iters_ref / (time.perf_counter() - t0)

    # TPU production mode: blocked FPS (16-way parallel buckets; exact
    # sequential FPS remains the parity default and is oracle-tested in
    # tests/test_reference_oracle.py). Both modes are timed: 'exact'
    # anchors the algorithm-identical comparison, 'bucketed' is the
    # shipped fast path (VERDICT r4 #7).
    out = {}
    for mode, buckets in (("bucketed", 16), ("exact", 1)):
        ours = PointNet2(depth=5, dim_feat=4, use_coords=True,
                         use_features=True, fps_buckets=buckets)
        cj, fj = jnp.asarray(coords), jnp.asarray(feats)
        vj = jnp.ones((b, n), bool)
        variables = jax.jit(
            lambda r, c, f, v: ours.init(r, c, f, v, train=False)
        )(jax.random.key(0), cj, fj, vj)
        fwd = jax.jit(
            lambda p, c, f, v: ours.apply(p, c, f, v, train=False)[
                "offset_predictions"
            ]
        )
        np.asarray(fwd(variables, cj, fj, vj))
        iters = 30
        trials = [
            _time_trial(fwd, iters, variables, cj, fj, vj)
            for _ in range(3)
        ]
        pps = b * n * iters / min(trials)
        key = "pointnet2_points_per_sec" + (
            "" if mode == "bucketed" else "_exact_fps"
        )
        out[key] = round(pps, 1)
        if mode == "bucketed":
            out["pointnet2_trials_points_per_sec"] = [
                round(b * n * iters / t, 1) for t in trials
            ]
    out["pointnet2_fps_mode"] = "bucketed16"
    out["pointnet2_reference_cpu_points_per_sec"] = round(ref_pps, 1)
    out["pointnet2_vs_reference_measured"] = round(
        out["pointnet2_points_per_sec"] / ref_pps, 2
    )
    return out


def _bench_ptv3(coords, feats, batch_ids, valid, b, n,
                stem_engine="gather", compute_dtype="float32",
                dedup_tokens=True):
    import jax

    from treemorph_tpu.evaluation.model_loaders import build_model

    # pool_shrink=4 halves the padded size of every pooled level; on this
    # dense-surface workload the real coarse counts fit the tighter caps
    # and the outputs are bit-identical to the lossless default
    # (verified max |diff| = 0.0; 324 -> 242 ms/forward).
    # dedup_divisor=4: level-0 convs run once per unique voxel (dup
    # factor 4.81 on this workload, 27,227 unique of 131k; exact spconv
    # semantics, see ops.sparse.DedupMap) — measured 264 -> 150 ms.
    # dedup_tokens: the WHOLE backbone runs on unique-voxel tokens and
    # broadcasts predictions to points (conv/pool math stays exact
    # spconv semantics; attention windows partition the compressed token
    # sequence — see models/ptv3.py) — measured 145 -> ~90 ms. Token
    # mode uses pool_shrink=2: compression already removed the 4.8x
    # duplicate slack, so pooled levels only coarsen ~2.3x and shrink=4
    # would DROP clusters (pool_overflow counted + asserted zero below).
    model = build_model(
        "pointtransformerv3",
        pool_shrink=2 if dedup_tokens else 4,
        dedup_divisor=4,
        stem_engine=stem_engine, compute_dtype=compute_dtype,
        dedup_tokens=dedup_tokens,
    )
    variables = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )(jax.random.key(0), coords, feats, batch_ids, valid)

    @jax.jit
    def forward(variables, coords, feats, batch_ids, valid):
        out = model.apply(
            variables, coords, feats, batch_ids, valid, train=False
        )
        return (
            out["offset_predictions"],
            out["dedup_overflow"] + out["pool_overflow"],
        )

    out = forward(variables, coords, feats, batch_ids, valid)
    np.asarray(out[0])
    assert int(out[1]) == 0, f"dedup/pool overflow {int(out[1])}"
    iters = 20  # amortize the fixed per-trial tunnel overhead (see main)
    trials = [
        _time_trial(forward, iters, variables, coords, feats, batch_ids,
                    valid)
        for _ in range(3)
    ]
    dt = min(trials)
    try:
        from treemorph_tpu.utils.flops import mfu_report

        mfu = mfu_report(
            lambda v_, c_, f_, bi_, vl_: model.apply(
                v_, c_, f_, bi_, vl_, train=False
            )["offset_predictions"],
            (variables, coords, feats, batch_ids, valid),
        )
    except Exception as e:  # noqa: BLE001
        mfu = {"error": f"{type(e).__name__}: {e}"[:160]}
    extra = {
        "ptv3_trials_points_per_sec": [
            round(b * n * iters / t, 1) for t in trials
        ],
        "ptv3_device_ms_per_forward": mfu.get("device_ms"),
        "ptv3_total_flops_per_forward": mfu.get("total_flops"),
        "mfu_ptv3": mfu.get("mfu", 0.0),
        "ptv3_mfu_error": mfu.get("error"),
        # device-time throughput: the engine's honest per-chip rate
        # with the tunnel's per-dispatch gap excluded
        "ptv3_device_points_per_sec": (
            round(b * n / (mfu["device_ms"] / 1e3), 1)
            if mfu.get("device_ms") else None
        ),
    }
    return b * n * iters / dt, {
        k: v for k, v in extra.items() if v is not None
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--n_devices", type=int, default=1,
        help="shard the TreeLearn inference batch over this many devices "
        "(tree-granular data parallelism); 1 = single chip (default)",
    )
    ap.add_argument("--treelearn_engine", default="band")
    ap.add_argument("--treelearn_conv_dtype", default="bfloat16")
    ap.add_argument("--treelearn_brick_impl", default="conv")
    ap.add_argument("--ptv3_stem_engine", default="band")
    ap.add_argument("--ptv3_compute_dtype", default="bfloat16")
    ap.add_argument("--ptv3_dedup_tokens", type=int, default=1)
    a = ap.parse_args()
    main(
        n_devices=a.n_devices,
        treelearn_engine=a.treelearn_engine,
        ptv3_stem_engine=a.ptv3_stem_engine,
        ptv3_compute_dtype=a.ptv3_compute_dtype,
        ptv3_dedup_tokens=bool(a.ptv3_dedup_tokens),
        treelearn_conv_dtype=a.treelearn_conv_dtype,
        treelearn_brick_impl=a.treelearn_brick_impl,
    )
