"""Checkpoint / resume for trained weights, optimizer state, and
long-running Monte-Carlo simulations.

The reference has NO persistence for model weights (no ``torch.save``
anywhere — SURVEY §5 "Checkpoint/resume: none"); its only persistence is
simulation-results JSON. Here checkpointing is a first-class capability via
orbax: weight tables + optimizer state for training, and (RNG key, error
counters, frames) for resumable Monte-Carlo runs.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_trainer_checkpoint",
    "load_trainer_checkpoint",
]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, tree: Any) -> str:
    """Save any pytree (weight dicts, optimizer states, counters) to
    ``path`` (a directory) via orbax."""
    path = os.path.abspath(path)
    # orbax requires leaves, not None entries
    tree = jax.tree_util.tree_map(np.asarray, _strip_none(tree))
    _checkpointer().save(path, tree, force=True)
    return path


def load_checkpoint(path: str, item: Any = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``item``: optional template pytree — the restore is mapped into its
    exact structure (NamedTuple fields, tuple order), which matters for
    optax states whose flatten order differs from orbax's sorted-dict
    order."""
    if item is not None:
        return _checkpointer().restore(os.path.abspath(path), item=item)
    return _checkpointer().restore(os.path.abspath(path))


def _strip_none(tree):
    if isinstance(tree, dict):
        return {k: _strip_none(v) for k, v in tree.items() if v is not None}
    return tree


def save_trainer_checkpoint(path: str, trainer, epoch: int) -> str:
    """Persist a :class:`~ldpc_tpu.train.PosteriorJointTrainer`'s full
    resumable state: decoder weights, Adam state, history, epoch."""
    state = {
        "weights": {k: v for k, v in trainer.decoder.weights.items()
                    if v is not None},
        "opt_state": trainer.opt_state,
        "epoch": np.int64(epoch),
    }
    save_checkpoint(path, state)
    # history is small & ragged: JSON sidecar
    with open(os.path.join(path, "history.json"), "w") as f:
        json.dump({
            "training_losses": trainer.training_losses,
            "validation_losses": trainer.validation_losses,
            "training_accuracies": trainer.training_accuracies,
            "gradient_norms": trainer.gradient_norms,
        }, f)
    return path


def load_trainer_checkpoint(path: str, trainer) -> int:
    """Restore state saved by :func:`save_trainer_checkpoint` into
    ``trainer``; returns the saved epoch.

    The optimizer state is restored INTO a freshly-initialized template
    (``orbax`` item-restore), so NamedTuple field order is preserved
    regardless of orbax's sorted-dict flatten order, and any structure
    mismatch (different optimizer, different weight shapes) raises instead
    of silently resuming with reset Adam moments."""
    raw = load_checkpoint(path)
    w = dict(trainer.decoder.weights)
    for k, v in raw["weights"].items():
        cur = w.get(k)
        if cur is None or np.shape(cur) != np.shape(v):
            raise ValueError(
                f"checkpoint weight {k!r} has shape {np.shape(v)} but this "
                f"trainer's decoder expects "
                f"{None if cur is None else np.shape(cur)}; refusing to "
                "resume into a mismatched decoder")
        w[k] = v
    fresh = trainer.optimizer.init(
        {k: v for k, v in w.items() if v is not None})
    template = {
        "weights": {k: v for k, v in w.items() if v is not None},
        "opt_state": fresh,
        "epoch": np.int64(0),
    }
    try:
        state = load_checkpoint(path, item=template)
    except Exception as e:
        raise ValueError(
            f"checkpoint at {path} does not match this trainer's "
            "weight/optimizer structure; refusing to resume with a "
            f"partially-restored state ({e})") from e
    saved_leaves = jax.tree_util.tree_leaves(state["opt_state"])
    fresh_leaves = jax.tree_util.tree_flatten(fresh)[0]
    if len(saved_leaves) != len(fresh_leaves) or any(
            np.shape(s) != np.shape(f)
            for s, f in zip(saved_leaves, fresh_leaves)):
        raise ValueError(
            f"optimizer state in {path} has a different structure than "
            "this trainer's optimizer; refusing to silently reinitialize")
    trainer.decoder.weights = w
    trainer.opt_state = state["opt_state"]
    hist_path = os.path.join(path, "history.json")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
        trainer.training_losses = hist["training_losses"]
        trainer.validation_losses = hist["validation_losses"]
        trainer.training_accuracies = hist["training_accuracies"]
        trainer.gradient_norms = hist["gradient_norms"]
    return int(state["epoch"])
