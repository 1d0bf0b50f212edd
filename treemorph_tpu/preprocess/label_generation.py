"""Supervision generation: project raw clouds onto reference QSMs.

Capability parity with reference ``PreProcessing/LabelGenerationCuda.py``:
pair each cloud ``.npy`` with its QSM ``.csv`` by plot_tree filename prefix
(:145-167), run the point->cylinder projection to get offset labels
(:113-135), append geometric features (normals k=15 + relative height,
:194-200), save ``*_labeled.npy`` with the (N, 11) layout (:203-205).

TPU redesign: the projection and the KNN features both run as single
batched device programs (``treemorph_tpu.ops``) instead of a 1024-point
host loop + per-point cKDTree SVDs.
"""

from __future__ import annotations

import logging
import os
import re

import numpy as np
import pandas as pd

from ..ops.features import add_features
from ..ops.projection import generate_offset_cloud
from ..utils.io import load_cloud

logger = logging.getLogger("treemorph_tpu.preprocess")


def clean_stem(filename: str) -> str:
    """'33_22_labeled.npy' / '33_22_000000.csv' -> '33_22'
    (reference :145-167)."""
    base = os.path.splitext(os.path.basename(filename))[0]
    match = re.match(r"^(\d+_\d+)", base)
    return match.group(1) if match else base


def label_clouds(
    cloud_dir: str,
    cylinder_dir: str,
    label_dir: str,
    tile: int = 4096,
    use_features: bool = True,
) -> list[str]:
    """Label every cloud in ``cloud_dir`` against its matching QSM.

    Returns the list of written ``*_labeled.npy`` paths.
    """
    os.makedirs(label_dir, exist_ok=True)
    clouds = {
        clean_stem(f): os.path.join(cloud_dir, f)
        for f in os.listdir(cloud_dir)
        if f.endswith((".npy", ".txt", ".las", ".laz"))
    }
    qsms = {
        clean_stem(f): os.path.join(cylinder_dir, f)
        for f in os.listdir(cylinder_dir)
        if f.endswith(".csv")
    }

    written = []
    for stem, cloud_path in sorted(clouds.items()):
        qsm_path = qsms.get(stem)
        if qsm_path is None:
            logger.warning("no QSM match for cloud %s", stem)
            continue
        cloud = load_cloud(cloud_path)
        if cloud is None or len(cloud) == 0:
            logger.warning("failed to load %s", cloud_path)
            continue
        qsm = pd.read_csv(qsm_path)
        qsm.columns = qsm.columns.str.strip().str.replace('"', "")

        labeled = generate_offset_cloud(cloud, qsm, tile=tile)  # (N, 7)
        if use_features:
            labeled = add_features(
                labeled,
                use_normals=True,
                use_heights=True,
                use_densities=False,
                use_curvatures=False,
                use_verticalities=False,
                use_distances=False,
            )  # (N, 11)
        else:
            labeled = np.concatenate(
                [labeled, np.ones((len(labeled), 4), labeled.dtype)], axis=1
            )

        out_path = os.path.join(label_dir, f"{stem}_labeled.npy")
        np.save(out_path, labeled)
        written.append(out_path)
        logger.info("labeled %s -> %s (%d pts)", stem, out_path, len(labeled))
    return written
