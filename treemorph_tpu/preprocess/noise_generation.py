"""Synthetic noise-cloud generation from QSMs.

Capability parity with reference ``PreProcessing/NoiseDataGeneration.py``:
sample points on each QSM's cylinder mantles with area- and
height-dependent density and lognormal(-3, 0.85) radial noise, then label
them by projecting back onto the QSM so the noise threshold splits the
classes (the core sampler lives in
:func:`treemorph_tpu.fixtures.synthetic.qsm_noise_cloud`).
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pandas as pd

from ..fixtures.synthetic import qsm_noise_cloud
from ..ops.projection import generate_offset_cloud
from .label_generation import clean_stem

logger = logging.getLogger("treemorph_tpu.preprocess")


def noise_generation(
    cylinder_dir: str,
    output_dir: str,
    density: float = 50.0,
    with_labels: bool = True,
    seed: int = 0,
) -> list[str]:
    """Generate a noise cloud per QSM csv in ``cylinder_dir``.

    With ``with_labels`` the output is the labeled (N, 7+) layout (noisy
    points + offsets to the QSM), directly consumable as the
    ``noise_root`` of :class:`treemorph_tpu.data.TreeDataset`; otherwise
    raw (N, 3) points like the reference (:103-106).
    """
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = []
    for name in sorted(os.listdir(cylinder_dir)):
        if not name.endswith(".csv"):
            continue
        qsm = pd.read_csv(os.path.join(cylinder_dir, name))
        qsm.columns = qsm.columns.str.strip()
        points = qsm_noise_cloud(qsm, density=density, rng=rng)
        if len(points) == 0:
            logger.warning("no noise points generated for %s", name)
            continue
        if with_labels:
            labeled = generate_offset_cloud(points, qsm)
            data = np.concatenate(
                [labeled, np.ones((len(labeled), 4), np.float32)], axis=1
            )
        else:
            data = points
        out_path = os.path.join(output_dir, f"{clean_stem(name)}.npy")
        np.save(out_path, data)
        written.append(out_path)
    return written
