"""Tracker construction by name (the adapter surface).

Capability-parity with the reference adapter layer
(``visualization/tao/trackers/sot/{pysot,pytracking}.py``): one entry
point builds any tracker family from a config + checkpoint, so
downstream tools (``Tracker.track`` batch runs, benchmark harnesses)
stay tracker-agnostic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_REGISTRY = {}


def register_tracker(name):
    def wrap(builder):
        _REGISTRY[name] = builder
        return builder
    return wrap


def build_tracker(name, **kwargs):
    """Known names: siamrpn, siamrpn_lt, dimp, atom, eco, sort."""
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown tracker '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


@register_tracker("siamrpn")
def _build_siamrpn(params=None, config=None, seed=0, **kwargs):
    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.trackers.siamrpn import (SiamConfig,
                                                 SiamRPNTracker)

    cfg = config or SiamConfig()
    model = SiameseTracker(num_levels=3, **kwargs)
    if params is None:
        z = jnp.zeros((1, cfg.exemplar_size, cfg.exemplar_size, 3))
        x = jnp.zeros((1, cfg.instance_size, cfg.instance_size, 3))
        params = model.init(jax.random.PRNGKey(seed), template=z,
                            search=x, mode="train")
    return SiamRPNTracker(model, params, cfg)


@register_tracker("siamrpn_lt")
def _build_siamrpn_lt(params=None, config=None, **kwargs):
    from tao_amodal_tpu.trackers.siamrpn import SiamConfig
    from tao_amodal_tpu.trackers.longterm import SiamRPNLTTracker

    cfg = config or SiamConfig(instance_size=255)
    return SiamRPNLTTracker(params=params, cfg=cfg, **kwargs)


@register_tracker("eco")
def _build_eco(**kwargs):
    from tao_amodal_tpu.trackers.eco import EcoTracker

    return EcoTracker(**kwargs)


@register_tracker("atom")
def _build_atom(**kwargs):
    from tao_amodal_tpu.trackers.atom import AtomTracker

    return AtomTracker(**kwargs)


@register_tracker("siammask")
def _build_siammask(params=None, config=None, seed=0, **kwargs):
    from tao_amodal_tpu.models.siamese import SiameseTracker
    from tao_amodal_tpu.trackers.siammask import SiamMaskTracker
    from tao_amodal_tpu.trackers.siamrpn import SiamConfig

    cfg = config or SiamConfig()
    model = SiameseTracker(num_levels=3, with_mask=True,
                           with_refine=True, **kwargs)
    if params is None:
        z = jnp.zeros((1, cfg.exemplar_size, cfg.exemplar_size, 3))
        x = jnp.zeros((1, cfg.instance_size, cfg.instance_size, 3))
        params = model.init(jax.random.PRNGKey(seed), z, x,
                            method="full_init")
    return SiamMaskTracker(model, params, cfg)


@register_tracker("dimp")
def _build_dimp(extractor_fn=None, iou_net=None, iou_variables=None,
                **kwargs):
    from tao_amodal_tpu.models.dimp import IoUNet
    from tao_amodal_tpu.trackers.dimp import DimpTracker

    if extractor_fn is None:
        raise ValueError("dimp needs extractor_fn (+ iou_net vars)")
    return DimpTracker(extractor_fn, iou_net, iou_variables, **kwargs)


@register_tracker("atom_deep")
def _build_atom_deep(**kwargs):
    from tao_amodal_tpu.trackers.deep_features import build_deep_atom

    return build_deep_atom(**kwargs)


@register_tracker("eco_deep")
def _build_eco_deep(**kwargs):
    from tao_amodal_tpu.trackers.deep_features import build_deep_eco

    return build_deep_eco(**kwargs)


@register_tracker("dimp_deep")
def _build_dimp_deep(**kwargs):
    from tao_amodal_tpu.trackers.deep_features import build_deep_dimp

    return build_deep_dimp(**kwargs)


@register_tracker("sort")
def _build_sort(**kwargs):
    from tao_amodal_tpu.trackers.sort import Sort

    return Sort(**kwargs)
