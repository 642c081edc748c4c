"""Checkpoint / resume for the autoencoder train state (SURVEY.md SS6.4).

The reference (Rust, single process) has no checkpointing; the TPU-native
rebuild gets two resume layers:

* AE train state via orbax (this module): params + optimizer state + step +
  the fitted FeatureScaler, so an interrupted run re-encodes with the exact
  same weights instead of retraining.
* Distance-matrix blocks via `.npz` files (parallel/pair_scheduler.py
  `block_dir`) — the all-pairs DTW job resumes at block granularity.

Orbax restores raw pytrees as nested dicts; optax optimizer states are
tuples of namedtuples, so restore goes through a freshly-initialized
template state (`init_state`) to recover the exact structure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from audio_pattern_discovery_tpu.config import AutoencoderConfig
from audio_pattern_discovery_tpu.models.autoencoder import (
    AutoEncoder,
    FeatureScaler,
    TrainState,
    init_state,
)

_STATE_DIR = "ae_state"


def save_ae_checkpoint(
    ckpt_dir: str | Path,
    state: TrainState,
    scaler: FeatureScaler | None = None,
) -> Path:
    """Persist the AE train state (+ feature scaler) under `ckpt_dir`."""
    path = (Path(ckpt_dir) / _STATE_DIR).resolve()
    tree: dict[str, Any] = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    if scaler is not None:
        tree["scaler"] = {"mean": scaler.mean, "std": scaler.std}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def has_ae_checkpoint(ckpt_dir: str | Path) -> bool:
    return (Path(ckpt_dir) / _STATE_DIR).is_dir()


def restore_ae_checkpoint(
    ckpt_dir: str | Path,
    cfg: AutoencoderConfig,
    input_dim: int,
) -> tuple[AutoEncoder, TrainState, FeatureScaler | None]:
    """Restore (model, state, scaler) saved by `save_ae_checkpoint`.

    `cfg`/`input_dim` must match the saved run: the template state built
    from them supplies the pytree structure (and shape-checks the load).
    """
    path = (Path(ckpt_dir) / _STATE_DIR).resolve()
    model, template, _ = init_state(
        cfg, input_dim, jax.random.PRNGKey(cfg.seed)
    )
    target: dict[str, Any] = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": 0,
        "scaler": {
            "mean": np.zeros((input_dim,), np.float32),
            "std": np.ones((input_dim,), np.float32),
        },
    }
    ckptr = ocp.StandardCheckpointer()
    # Ask the checkpoint itself whether a scaler was saved (robust to orbax
    # error-message wording changes); fall back to the exception heuristic
    # only if the metadata API is unavailable.
    try:
        saved_keys = set(ckptr.metadata(path).item_metadata.keys())
        if "scaler" not in saved_keys:
            target.pop("scaler")
        tree = ckptr.restore(path, target)
    except ValueError as e:
        if "scaler" not in str(e) or "do not match" not in str(e):
            raise
        target.pop("scaler", None)
        tree = ckptr.restore(path, target)
    state = TrainState(tree["params"], tree["opt_state"], int(tree["step"]))
    scaler = None
    if "scaler" in tree:
        scaler = FeatureScaler(
            np.asarray(tree["scaler"]["mean"], np.float32),
            np.asarray(tree["scaler"]["std"], np.float32),
        )
    return model, state, scaler


# ---------------------------------------------------------------- PCA
# The PCA embedder's "state" is four small arrays; a plain .npz is the
# whole checkpoint (orbax would be machinery without benefit here).

_PCA_FILE = "pca_state.npz"


def save_pca_checkpoint(ckpt_dir, state, scaler) -> None:
    """Persist PCAState + FeatureScaler under `ckpt_dir`."""
    from pathlib import Path as _P

    d = _P(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    np.savez(
        d / _PCA_FILE,
        mean=state.mean,
        components=state.components,
        scale=state.scale,
        explained=state.explained,
        scaler_mean=scaler.mean,
        scaler_std=scaler.std,
    )


def has_pca_checkpoint(ckpt_dir) -> bool:
    return (Path(ckpt_dir) / _PCA_FILE).is_file()


def restore_pca_checkpoint(ckpt_dir):
    """-> (PCAState, FeatureScaler) saved by save_pca_checkpoint."""
    from audio_pattern_discovery_tpu.models.pca import PCAState

    z = np.load(Path(ckpt_dir) / _PCA_FILE)
    state = PCAState(
        mean=z["mean"], components=z["components"],
        scale=z["scale"], explained=z["explained"],
    )
    scaler = FeatureScaler(z["scaler_mean"], z["scaler_std"])
    return state, scaler
