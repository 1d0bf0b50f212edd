"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4.6). The env vars must be set
before jax initializes its backends, hence at conftest import time.
"""

import os

# The sandbox presets JAX_PLATFORMS=axon (TPU tunnel); tests must run on the
# host CPU with 8 virtual devices, so override — not setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The persistent compilation cache is DISABLED for CPU runs: this
# jaxlib's XLA:CPU AOT loader deterministically SEGFAULTS deserializing
# certain cached executables (reproduced with a fresh cache dir, same
# machine, write-then-read within one pytest run; the loader also warns
# about a +prefer-no-gather target-feature mismatch against its own
# host). Reruns re-compile — slower, but stable. The TPU bench cache
# (bench.py) uses a different loader and is unaffected.
jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# Fast lane: `pytest -m "not slow"` completes in a few minutes cold; the
# slow set is the e2e CLI runs, the multichip dryrun subprocess, mesh
# training, and the overfit/pipeline integration tests (all >30 s cold,
# measured via --durations on this sandbox).
SLOW_TESTS = {
    "test_scripts.py",  # CLI e2e (preprocess/train/pipeline subprocesses)
    "test_noise_path.py",  # trains the noise family end-to-end
    # torch-oracle + checkpoint-import suites (reference torch forwards
    # on one core) and Pallas interpret-mode engine suites dominate the
    # >50 min full-suite wall (VERDICT r4 #9); the fast lane keeps the
    # gather-engine, model-forward and pipeline coverage
    "test_reference_oracle.py",
    "test_import_ptv3.py",
    "test_import_torch.py",
    "test_bandconv.py",
    "test_zpack.py",
    "test_pencil.py",
    "test_bricks.py",
    "test_tiles.py",
}
SLOW_NODES = (
    "test_dryrun_multichip",
    "test_training_on_mesh_reduces_loss",
    "test_overfits",
    "test_reaches_min_points",
    "test_nn_eval_with_trained_model",
    "test_labels_match_format",
    "test_midpoints_near_original_surface",
    "test_reproducible_with_seed",
    "test_seeded_fit_golden_properties",
    "test_forward_shapes_and_masking",
    "test_use_feats_false_ignores_features",
    "test_treelearn_brick_engine_forward",
    "test_voxel_size_controls_resolution",
    "test_noise_cloud_semantic_pass",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in SLOW_TESTS or any(
            item.name.startswith(n) for n in SLOW_NODES
        ):
            item.add_marker(pytest.mark.slow)
