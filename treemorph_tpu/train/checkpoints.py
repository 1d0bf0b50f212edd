"""Orbax checkpointing with a metadata manifest.

Replaces the reference's ``torch.save(state_dict)`` inside EarlyStopper
(``Modules/Utils.py:37-51``) and its filename-encoded configuration
(``TreeLearn_V0.02_U3_N0.1_O_FNH_CV/_P{plot}.pt``, SURVEY.md §5) with full
train-state checkpoints plus an explicit ``metadata.json`` (model family,
hyperparameters, CV plot, noise threshold), enabling exact resume.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, metadata: dict | None = None):
    """Save a pytree (TrainState or bare params) + metadata manifest."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        # fully addressable host arrays for single-process save
        state = jax.tree.map(
            lambda x: jax.device_get(x) if hasattr(x, "devices") else x, state
        )
        ckptr.save(path, state, force=True)
    if metadata is not None:
        with open(path + ".metadata.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` provides the structure/shapes (e.g. a freshly initialized
    TrainState).
    """
    path = os.path.abspath(path)
    template = jax.tree.map(
        lambda x: jax.device_get(x) if hasattr(x, "devices") else x, template
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def save_model_checkpoint(path: str, state, metadata: dict | None = None):
    """Save only the inference variables {params, batch_stats} of a
    TrainState — the deployment checkpoint format consumed by
    :mod:`treemorph_tpu.evaluation.model_loaders`."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    save_checkpoint(path, variables, metadata)


def load_metadata(path: str) -> dict | None:
    meta_path = os.path.abspath(path) + ".metadata.json"
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)
