"""treemorph_tpu — TPU-native tree-morphology extraction from LiDAR point clouds.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference pipeline ``RobinDanek/Extracting-Tree-Morphology-From-Point-Clouds``
(see SURVEY.md): neural point-cloud refinement (TreeLearn sparse-UNet,
PointTransformerV3, PointNet++) with offset-regression + noise-classification
heads, KNN-midpoint upsampling, and sphere-following QSM cylinder fitting —
redesigned for TPU hardware: static shapes, padded/bucketed batching, MXU-sized
matmuls, Pallas kernels for the hot geometry ops, and ``jax.sharding`` meshes
for multi-chip scale-out.

Layout:
    utils/       host-side IO, fitting helpers, early stopping
    fixtures/    synthetic QSM / cylinder-cloud generators (testing without data)
    ops/         device geometry kernels (projection, serialization, voxelize,
                 KNN, FPS/ball-query, sparse conv)
    data/        padded static-shape dataset + batching
    models/      flax model families (PointNet2, TreeLearn, PTv3) + loss
    train/       optax harness, schedules, orbax checkpoints
    parallel/    device mesh + sharding helpers
    pipeline/    stage1 predict / stage2 upsample / stage3 QSM fit
    evaluation/  NN-distance eval, model loading
    preprocess/  label generation, noise generation, rasterization, splits
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Restore standard jax env-var behavior: some sandboxes register a
    # TPU PJRT plugin via sitecustomize that ignores JAX_PLATFORMS, so a
    # CLI subprocess launched with JAX_PLATFORMS=cpu (the test suite, CI)
    # would still initialize the TPU backend — and HANG if the device
    # tunnel is down. Explicitly honoring the env var keeps every entry
    # point runnable where the caller said.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backends already initialized — caller's choice
        pass
