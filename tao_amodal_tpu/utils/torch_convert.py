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


def _linear(w):
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return np.transpose(w, (1, 0))


def _linear_on_pooled(w, pool_hw, channels):
    """Linear over FLATTENED pooled RoI features: torch flattens
    ``[C, h, w]`` (channel-major), flax flattens ``[h, w, C]`` —
    permute the input columns before transposing."""
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pool_hw, pool_hw)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, -1)
    return _linear(w)


def convert_fpn(torch_sd, num_laterals=3, num_extra=2,
                prefix="backbone.", first_level=3):
    """detectron2-style FPN names -> our :class:`..models.fpn.FPN`.

    ``fpn_lateral{l}`` -> ``lateral_{i}``, ``fpn_output{l}`` ->
    ``post_{i}`` (l counts pyramid levels from ``first_level``),
    ``top_block.p6/p7`` -> ``extra_{0,1}`` (our extra levels chain
    WITHOUT the detectron2 LastLevelP6P7 interior ReLU — a documented
    deviation; converted weights are layout-identical either way).
    """
    sd = {k[len(prefix):]: v for k, v in torch_sd.items()
          if k.startswith(prefix)}
    params = {}
    for i in range(num_laterals):
        lvl = first_level + i
        params[f"lateral_{i}"] = {
            "kernel": _conv(sd[f"fpn_lateral{lvl}.weight"]),
            "bias": sd[f"fpn_lateral{lvl}.bias"]}
        params[f"post_{i}"] = {
            "kernel": _conv(sd[f"fpn_output{lvl}.weight"]),
            "bias": sd[f"fpn_output{lvl}.bias"]}
    for j in range(num_extra):
        lvl = first_level + num_laterals + j
        params[f"extra_{j}"] = {
            "kernel": _conv(sd[f"top_block.p{lvl}.weight"]),
            "bias": sd[f"top_block.p{lvl}.bias"]}
    return {"params": params}


def convert_rpn_head(torch_sd, prefix="proposal_generator.rpn_head."):
    """detectron2 ``rpn_head.{conv,objectness_logits,anchor_deltas}``
    -> our :class:`..models.rpn.RPNHead` (``tower/obj/delta``)."""
    sd = {k[len(prefix):]: v for k, v in torch_sd.items()
          if k.startswith(prefix)}
    conv_key = "conv.weight" if "conv.weight" in sd \
        else "conv.conv0.weight"
    conv_bias = conv_key.replace("weight", "bias")
    return {"params": {
        "tower": {"kernel": _conv(sd[conv_key]),
                  "bias": sd[conv_bias]},
        "obj": {"kernel": _conv(sd["objectness_logits.weight"]),
                "bias": sd["objectness_logits.bias"]},
        "delta": {"kernel": _conv(sd["anchor_deltas.weight"]),
                  "bias": sd["anchor_deltas.bias"]},
    }}


def convert_box_head(torch_sd, num_classes, pool_hw=7, channels=256,
                     prefix="roi_heads."):
    """detectron2 ``box_head.fc{1,2}`` + ``box_predictor.{cls_score,
    bbox_pred}`` -> our :class:`..models.detector.RoIBoxHead`.

    Background-class convention: detectron2 puts background LAST in
    ``cls_score``; our head drops index 0 as background — the rows are
    rolled accordingly.
    """
    sd = {k[len(prefix):]: v for k, v in torch_sd.items()
          if k.startswith(prefix)}
    cls_w = sd["box_predictor.cls_score.weight"]
    cls_b = sd["box_predictor.cls_score.bias"]
    # [fg0..fgC-1, bg] -> [bg, fg0..fgC-1]
    roll_w = np.concatenate([cls_w[-1:], cls_w[:-1]], axis=0)
    roll_b = np.concatenate([cls_b[-1:], cls_b[:-1]], axis=0)
    assert roll_w.shape[0] == num_classes + 1, (
        roll_w.shape, num_classes)
    return {"params": {
        "Dense_0": {
            "kernel": _linear_on_pooled(sd["box_head.fc1.weight"],
                                        pool_hw, channels),
            "bias": sd["box_head.fc1.bias"]},
        "Dense_1": {"kernel": _linear(sd["box_head.fc2.weight"]),
                    "bias": sd["box_head.fc2.bias"]},
        "Dense_2": {"kernel": _linear(roll_w), "bias": roll_b},
        "Dense_3": {"kernel": _linear(sd["box_predictor.bbox_pred"
                                         ".weight"]),
                    "bias": sd["box_predictor.bbox_pred.bias"]},
    }}


def convert_detector_checkpoint(path_or_dict, num_classes,
                                stage_sizes=(3, 4, 6, 3),
                                seed_variables=None):
    """Full GTR-style R50+FPN detector checkpoint -> our
    :class:`..models.detector.ClipDetector` variables.

    Covers every weight-bearing layer: trunk (torchvision naming under
    ``backbone.bottom_up.``), FPN laterals/outputs/top-block, RPN
    head, and the 2-fc box head with the background-row roll and the
    channel-major->HWC flatten permutation.  With ``seed_variables``
    (from ``ClipDetector.init``) the converted tree is grafted via
    ``load_pretrain`` and (variables, report) is returned; otherwise
    the raw converted tree.

    Reference loading semantics: ``pysot/utils/model_load.py`` /
    detectron2 ``DetectionCheckpointer`` as used by the GTR inference
    stack (`/root/reference/README.md:96-127` eval protocol).
    """
    sd = load_torch_state_dict(path_or_dict)
    prefix = "backbone.bottom_up." if any(
        k.startswith("backbone.bottom_up.") for k in sd) else ""
    trunk = convert_resnet(sd, stage_sizes=stage_sizes, prefix=prefix)
    fpn = convert_fpn(sd)
    rpn = convert_rpn_head(sd)
    # Infer pooled channels / bin count from the checkpoint itself:
    # fc1 input = pool^2 * C with C = the FPN feature width.
    channels = fpn["params"]["lateral_0"]["kernel"].shape[-1]
    in_dim = sd["roi_heads.box_head.fc1.weight"].shape[1]
    pool_hw = int(round((in_dim // channels) ** 0.5))
    head = convert_box_head(sd, num_classes, pool_hw=pool_hw,
                            channels=channels)
    converted = {
        "params": {"backbone": trunk["params"],
                   "fpn": fpn["params"],
                   "rpn": rpn["params"],
                   "box_head": head["params"]},
        "batch_stats": {"backbone": trunk["batch_stats"]},
    }
    if seed_variables is None:
        return converted
    from tao_amodal_tpu.utils.checkpoint import load_pretrain

    return load_pretrain(seed_variables, converted)


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
