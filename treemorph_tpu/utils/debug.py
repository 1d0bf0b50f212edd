"""Debug-mode toggles.

Parity with the reference's debug modes (SURVEY.md §5):
``torch.autograd.set_detect_anomaly`` + ``CUDA_LAUNCH_BLOCKING=1`` become
``jax_debug_nans`` (fail fast at the op that produced a NaN) and
``jax_disable_jit`` (the synchronous-execution escape hatch for
pinpointing failures).
"""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks(on: bool = True):
    """Fail at the first NaN-producing op (reference's anomaly detection,
    train_utils.py:161)."""
    jax.config.update("jax_debug_nans", on)


@contextlib.contextmanager
def synchronous_mode():
    """Run eagerly without jit — the CUDA_LAUNCH_BLOCKING analog: errors
    surface at the failing op instead of at a later sync point."""
    with jax.disable_jit():
        yield


@contextlib.contextmanager
def debug_mode():
    """NaN checks + eager execution together."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        with jax.disable_jit():
            yield
    finally:
        jax.config.update("jax_debug_nans", old)
