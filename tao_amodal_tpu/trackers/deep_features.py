"""Deep-backbone feature plugs for the online trackers.

The reference pytracking trackers extract ResNet block features from a
search-area crop and run the discriminative filter on that map
(``pytracking/tracker/dimp/dimp.py:80-155``,
``pytracking/features/deep.py``).  Here the same capability is one
jittable closure: the tracker crops at ``sample_size = S * stride``
pixels, the backbone maps it to the ``SxS`` response grid, and the
whole init/step stays inside a single XLA program (backbone included —
no feature-cache layer like the reference's, because recompute inside
the fused program is cheaper than a host round-trip on TPU).

Weights: random-init by default (zero-egress environment); pass
``variables`` converted from a torch checkpoint via
``utils/torch_convert.py`` for trained features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ImageNet normalization, the convention trained torch backbones expect.
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)

_STAGE_STRIDE = {1: 4, 2: 8, 3: 16, 4: 32}


def make_resnet_feature_fn(search_size, out_stage=2, variables=None,
                           stage_sizes=(3, 4, 6, 3),
                           dtype=jnp.float32, seed=0):
    """Build a ``crop [P, P, 3] -> feats [S, S, C]`` ResNet closure.

    ``P = search_size * stride(out_stage)`` so the stride-``stride``
    stage output lands exactly on the ``SxS`` response grid the
    ATOM/ECO filters run on (reference ATOM: 288px crop -> 18x18
    layer3 map, ``atom/default.py`` settings).

    Returns ``(feature_fn, variables, sample_size)``.
    """
    from tao_amodal_tpu.models.backbones import ResNet

    stride = _STAGE_STRIDE[out_stage]
    sample_size = search_size * stride
    model = ResNet(stage_sizes=stage_sizes, out_stages=(out_stage,),
                   dtype=dtype)
    if variables is None:
        probe = jnp.zeros((1, sample_size, sample_size, 3), dtype)
        variables = model.init(jax.random.PRNGKey(seed), probe)

    mean = jnp.asarray(_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(_STD, jnp.float32) * 255.0

    def feature_fn(crop):
        x = (crop.astype(jnp.float32) - mean) / std
        feats = model.apply(variables, x[None].astype(dtype))[0]
        return feats.astype(jnp.float32)

    return feature_fn, variables, sample_size


def make_dimp_extractor(search_size=288, feat_stride=16,
                        variables=None, stage_sizes=(3, 4, 6, 3),
                        dtype=jnp.float32, seed=0):
    """Backbone embedding for :class:`..trackers.dimp.DimpTracker`:
    ``crop [S, S, 3] -> feat [S/stride, S/stride, C]`` (the reference's
    classification-features extraction, ``dimp.py:80-98``).

    Returns ``(extractor_fn, variables)``.
    """
    out_stage = {v: k for k, v in _STAGE_STRIDE.items()}[feat_stride]
    fn, variables, _ = make_resnet_feature_fn(
        search_size // feat_stride, out_stage=out_stage,
        variables=variables, stage_sizes=stage_sizes, dtype=dtype,
        seed=seed)
    return fn, variables


def build_deep_atom(search_size=18, out_stage=2, variables=None,
                    stage_sizes=(3, 4, 6, 3), seed=0, **kwargs):
    """ATOM on ResNet features (reference ATOM runs layer3 at 18x18;
    default here is the stride-8 stage at the same grid)."""
    from tao_amodal_tpu.trackers.atom import AtomTracker

    fn, variables, sample = make_resnet_feature_fn(
        search_size, out_stage=out_stage, variables=variables,
        stage_sizes=stage_sizes, seed=seed)
    kwargs.setdefault("filter_size", 5)
    return AtomTracker(feature_fn=fn, search_size=search_size,
                       sample_size=sample, **kwargs)


def build_deep_eco(search_size=18, out_stage=2, variables=None,
                   stage_sizes=(3, 4, 6, 3), seed=0, **kwargs):
    """ECO on ResNet features (reference ECO's deep branch)."""
    from tao_amodal_tpu.trackers.eco import EcoTracker

    fn, variables, sample = make_resnet_feature_fn(
        search_size, out_stage=out_stage, variables=variables,
        stage_sizes=stage_sizes, seed=seed)
    kwargs.setdefault("filter_size", 5)
    return EcoTracker(feature_fn=fn, search_size=search_size,
                      sample_size=sample, **kwargs)


def build_deep_dimp(search_size=288, feat_stride=16, variables=None,
                    iou_variables=None, stage_sizes=(3, 4, 6, 3),
                    seed=0, **kwargs):
    """DiMP with a ResNet classification branch + IoUNet (reference
    ``dimp.py`` + ``ltr/models/tracking/dimpnet.py`` capability)."""
    from tao_amodal_tpu.models.dimp import IoUNet
    from tao_amodal_tpu.trackers.dimp import DimpTracker

    extractor, variables = make_dimp_extractor(
        search_size, feat_stride, variables=variables,
        stage_sizes=stage_sizes, seed=seed)
    iou_net = IoUNet()
    if iou_variables is None:
        probe = extractor(
            jnp.zeros((search_size, search_size, 3), jnp.float32))
        mod_dim = iou_net.pool_size ** 2 * probe.shape[-1]
        iou_variables = iou_net.init(
            jax.random.PRNGKey(seed + 1), probe,
            jnp.zeros((mod_dim,)),
            jnp.asarray([[0.0, 0.0, 8.0, 8.0]]),
            spatial_scale=1.0 / feat_stride)
    return DimpTracker(extractor, iou_net, iou_variables,
                       search_size=search_size,
                       feat_stride=feat_stride, **kwargs)
