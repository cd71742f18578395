"""Torch-checkpoint -> flax conversion for the real-weights path.

The reference stacks load torch checkpoints with torch-resnet naming
(``pysot/utils/model_load.py``; pysot's ``resnet_atrous.py`` reuses
the torchvision layer naming: ``conv1/bn1``, ``layer{1..4}.{b}.conv{1,
2,3}``, ``.downsample.{0,1}``, and tracker checkpoints prefix
submodules with ``backbone./neck./rpn_head.`` plus an optional
``module.`` DataParallel wrapper).  This module converts such
state_dicts into our flax variable trees:

  * conv kernels: torch OIHW -> flax HWIO;
  * BatchNorm: ``weight/bias`` -> params ``scale/bias``;
    ``running_mean/running_var`` -> batch_stats ``mean/var``;
  * name mapping to our module auto-naming (``ConvBN_k/Conv_0`` etc.).

Checkpoint files are read with ``torch.load`` when torch is importable
(the test suite builds a real torch ResNet and round-trips through
``torch.save``); already-loaded dicts of numpy arrays work without
torch installed.
"""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path_or_dict):
    """Accept a path to a torch checkpoint or an in-memory mapping.

    Unwraps the common containers (``{'state_dict': ...}``,
    ``{'model': ...}``) and strips the DataParallel ``module.``
    prefix (reference ``model_load.py::remove_prefix``).
    Returns ``{name: np.ndarray}``.
    """
    if isinstance(path_or_dict, (str, bytes)) or hasattr(
            path_or_dict, "__fspath__"):
        import torch

        data = torch.load(path_or_dict, map_location="cpu",
                          weights_only=True)
    else:
        data = path_or_dict
    for key in ("state_dict", "model"):
        if isinstance(data, dict) and key in data and isinstance(
                data[key], dict):
            data = data[key]
    out = {}
    for k, v in data.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _conv(w):
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _put(params, stats, scope, torch_sd, conv_key, bn_key):
    """Fill one ConvBN scope from torch conv+bn entries."""
    entry = {"Conv_0": {"kernel": _conv(torch_sd[conv_key])}}
    if bn_key is not None:
        entry["BatchNorm_0"] = {
            "scale": torch_sd[bn_key + ".weight"],
            "bias": torch_sd[bn_key + ".bias"],
        }
        stats[scope] = {"BatchNorm_0": {
            "mean": torch_sd[bn_key + ".running_mean"],
            "var": torch_sd[bn_key + ".running_var"],
        }}
    params[scope] = entry


def convert_resnet(torch_sd, stage_sizes=(3, 4, 6, 3), prefix=""):
    """torch-resnet state_dict -> our ``ResNet`` (classic stem)
    variables ``{'params': ..., 'batch_stats': ...}``.

    Args:
      torch_sd: flat ``{name: array}`` (see
        :func:`load_torch_state_dict`).
      prefix: e.g. ``"backbone."`` for pysot tracker checkpoints.
    """
    sd = {k[len(prefix):]: v for k, v in torch_sd.items()
          if k.startswith(prefix)}
    params, stats = {}, {}
    _put(params, stats, "ConvBN_0", sd, "conv1.weight", "bn1")

    blk = 0
    for stage, blocks in enumerate(stage_sizes, start=1):
        for b in range(blocks):
            t = f"layer{stage}.{b}"
            scope = f"Bottleneck_{blk}"
            bp, bs = {}, {}
            for j in range(3):
                _put(bp, bs, f"ConvBN_{j}", sd,
                     f"{t}.conv{j + 1}.weight", f"{t}.bn{j + 1}")
            if f"{t}.downsample.0.weight" in sd:
                _put(bp, bs, "ConvBN_3", sd,
                     f"{t}.downsample.0.weight", None)
                bp["ConvBN_3"]["BatchNorm_0"] = {
                    "scale": sd[f"{t}.downsample.1.weight"],
                    "bias": sd[f"{t}.downsample.1.bias"],
                }
                bs["ConvBN_3"] = {"BatchNorm_0": {
                    "mean": sd[f"{t}.downsample.1.running_mean"],
                    "var": sd[f"{t}.downsample.1.running_var"],
                }}
            params[scope] = bp
            stats[scope] = bs
            blk += 1

    used = {k for k in sd
            if k.startswith(("conv1.", "bn1.", "layer"))}
    unused = sorted(set(sd) - used)
    if unused:
        logger.info("convert_resnet: %d entries not mapped (e.g. %s)",
                    len(unused), unused[:3])
    return {"params": params, "batch_stats": stats}


def convert_adjust_necks(torch_sd, num_levels=3, prefix="neck."):
    """pysot AdjustAllLayer (``neck.downsample{2,3,4}.downsample``)
    -> our ``necks_{i}`` AdjustLayer variables."""
    params, stats = {}, {}
    for i in range(num_levels):
        # single-level necks are named 'neck.downsample.downsample'
        cands = [f"downsample{i + 2}.downsample", "downsample"]
        base = None
        for c in cands:
            if f"{prefix}{c}.0.weight" in torch_sd:
                base = f"{prefix}{c}"
                break
        if base is None:
            continue
        params[f"necks_{i}"] = {
            "Conv_0": {"kernel": _conv(torch_sd[f"{base}.0.weight"])},
            "BatchNorm_0": {
                "scale": torch_sd[f"{base}.1.weight"],
                "bias": torch_sd[f"{base}.1.bias"],
            },
        }
        stats[f"necks_{i}"] = {"BatchNorm_0": {
            "mean": torch_sd[f"{base}.1.running_mean"],
            "var": torch_sd[f"{base}.1.running_var"],
        }}
    return {"params": params, "batch_stats": stats}


def convert_siamese_checkpoint(path_or_dict, model, seed_variables):
    """Best-effort pysot tracker checkpoint -> SiameseTracker
    variables: backbone + necks grafted onto ``seed_variables``;
    head weights (architecturally different here) stay initialized.

    Returns (variables, report) where report lists loaded/missing.
    """
    from tao_amodal_tpu.utils.checkpoint import load_pretrain

    sd = load_torch_state_dict(path_or_dict)
    trunk = convert_resnet(sd, prefix="backbone.")
    necks = convert_adjust_necks(sd)

    pretrained = {
        "params": {"backbone": trunk["params"], **necks["params"]},
        "batch_stats": {"backbone": trunk["batch_stats"],
                        **necks["batch_stats"]},
    }
    return load_pretrain(seed_variables, pretrained)
