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
