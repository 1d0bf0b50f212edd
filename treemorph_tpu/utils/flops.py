"""Analytic FLOP accounting + device-time measurement for MFU reporting.

MFU = analytic FLOPs per forward / measured device time / chip peak —
the roofline lens VERDICT r4 asked for (missing #1): points/sec alone
cannot say whether an engine is at 3% or 30% of the hardware.

FLOPs come from two sources:

- **XLA ops**: ``Compiled.cost_analysis()['flops']`` — XLA's own
  analytic count over the optimized HLO (matmuls, convs, elementwise).
- **Pallas kernels**: invisible to XLA cost analysis, so each kernel
  wrapper logs its analytic FLOPs at TRACE time into
  :data:`PALLAS_FLOP_LOG` (band conv: ``2*M*K*(nsplit*WIN*Cin +
  blk*Cin*Cout)`` one-hot selects + filter matmuls; zband:
  ``2*M*K*(nsplit*WIN*Cin + Cin*Cout)``; window attention:
  ``4*N*W*D`` for the QK^T and AV matmuls). Tracing runs the Python
  body exactly once per compilation, so ``reset`` + ``jit(f).lower()``
  collects one forward's worth.

Both are *work actually issued* (the one-hot selects are real MXU work
even though a gather would move fewer bytes), so the resulting MFU is
the roofline position of the implementation, not of an idealized
algorithm; BENCH JSON reports the FLOP total alongside so either view
can be recomputed.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import tempfile
import time

import numpy as np

#: (tag, flops) tuples appended by Pallas kernel wrappers at trace time.
PALLAS_FLOP_LOG: list[tuple[str, float]] = []


def log_pallas_flops(tag: str, flops: float) -> None:
    PALLAS_FLOP_LOG.append((tag, float(flops)))


def reset_pallas_flop_log() -> None:
    PALLAS_FLOP_LOG.clear()


#: dense bf16 peak FLOPs/s per chip by device_kind substring (public
#: figures: cloud.google.com/tpu/docs/system-architecture-tpu-vm)
_CHIP_PEAKS_BF16 = (
    ("v6", 918e12),  # Trillium / v6e
    ("v5p", 459e12),
    ("v5", 197e12),  # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def chip_peak_flops_bf16(device=None) -> float:
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _CHIP_PEAKS_BF16:
        if sub in kind:
            return peak
    return 197e12  # conservative default (v5e)


def analytic_flops(fn, *args) -> dict:
    """Analytic FLOPs of one jitted call of ``fn(*args)``.

    Returns {'xla_flops', 'pallas_flops', 'total_flops'}. Forces a fresh
    trace (``jax.jit(fn).lower``) so the Pallas trace-time log captures
    exactly one forward.
    """
    import jax

    reset_pallas_flop_log()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    xla = float((ca or {}).get("flops", 0.0))
    pallas = float(sum(f for _, f in PALLAS_FLOP_LOG))
    return {
        "xla_flops": xla,
        "pallas_flops": pallas,
        "total_flops": xla + pallas,
    }


def _trace_device_ms(trace_dir: str, iters: int) -> float:
    """Sum per-op device time on TPU pids from a profiler trace, /iters."""
    files = glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True
    )
    if not files:
        return float("nan")
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {
        p for p, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower() or "Chip" in name
    }
    if not tpu_pids:
        tpu_pids = set(pid_names)
    # top-level XLA module spans (jit_*) cover their component ops;
    # summing only them avoids double counting
    total = 0.0
    modules = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        dur = ev.get("dur", 0) / 1e3
        total += dur
        if ev.get("name", "").startswith("jit_"):
            modules += dur
    ms = modules if modules > 0 else total
    return ms / iters


def measure_device_time_ms(fn, args, iters: int = 3) -> float:
    """Per-call DEVICE time of ``fn(*args)`` via a jax.profiler trace.

    Complements wall-clock timing: under the sandbox's tunneled TPU,
    wall time includes a per-execute dispatch gap that is measurement
    environment, not engine cost (VERDICT r4 #4's contention blindness).
    """
    import jax

    out = fn(*args)  # ensure compiled
    jax.block_until_ready(out)
    tdir = tempfile.mkdtemp(prefix="mfu_trace_")
    try:
        with jax.profiler.trace(tdir):
            outs = [fn(*args) for _ in range(iters)]
            jax.block_until_ready(outs[-1])
        return _trace_device_ms(tdir, iters)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)


def mfu_report(fn, args, iters: int = 3, peak: float | None = None) -> dict:
    """FLOPs + device time + MFU for one jitted forward."""
    import jax

    flops = analytic_flops(fn, *args)
    dt_ms = measure_device_time_ms(fn, args, iters=iters)
    peak = peak or chip_peak_flops_bf16()
    achieved = (
        flops["total_flops"] / (dt_ms / 1e3) if dt_ms and dt_ms > 0 else 0.0
    )
    return {
        **flops,
        "device_ms": round(float(dt_ms), 3),
        "achieved_flops_per_sec": achieved,
        "peak_flops_bf16": peak,
        "mfu": round(achieved / peak, 4) if peak else 0.0,
    }
