"""Long-term Siamese tracking (SiamRPNLT capability).

Capability-parity with the reference long-term variant
(``pysot/tracker/siamrpn_lt_tracker.py``): when the best score drops
below a confidence threshold the tracker enters a re-detection mode
that searches a larger window without updating the state; normal
tracking resumes once confidence recovers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tao_amodal_tpu.trackers.siamrpn import (
    SiamConfig,
    SiamRPNTracker,
    make_siamrpn_step,
)


class SiamRPNLTTracker(SiamRPNTracker):
    def __init__(self, model=None, params=None,
                 cfg: SiamConfig = SiamConfig(),
                 confidence_low=0.85, redetect_scale=2.0, seed=0):
        if model is None:
            import jax

            from tao_amodal_tpu.models.siamese import SiameseTracker

            model = SiameseTracker(num_levels=3)
            if params is None:
                z = jnp.zeros((1, cfg.exemplar_size,
                               cfg.exemplar_size, 3))
                x = jnp.zeros((1, cfg.instance_size,
                               cfg.instance_size, 3))
                params = model.init(jax.random.PRNGKey(seed),
                                    template=z, search=x, mode="train")
        super().__init__(model, params, cfg)
        self.confidence_low = confidence_low
        self.redetect_scale = redetect_scale
        self.lost = False
        # A second step function with a widened search window for
        # re-detection (reference: instance_size 831 in lost mode).
        wide_cfg = cfg._replace(window_influence=0.0)
        self._wide_init, self._wide_step = make_siamrpn_step(
            model, params, wide_cfg)

    def update(self, image):
        img = jnp.asarray(image)
        if not self.lost:
            self.state, (box, score) = self.step_fn(self.state, img)
            if float(score) < self.confidence_low:
                self.lost = True
            return np.asarray(box), float(score)

        # Lost mode: search a widened region (no window prior, larger
        # context); state only updates on a confident re-detection.
        wide_state = self.state._replace(
            size=self.state.size * self.redetect_scale)
        new_state, (box, score) = self._wide_step(wide_state, img)
        if float(score) >= self.confidence_low:
            self.lost = False
            self.state = new_state._replace(
                size=new_state.size / self.redetect_scale)
        cur = self.state
        out_box = np.asarray(jnp.concatenate(
            [cur.center - cur.size / 2, cur.size]))
        return (np.asarray(box) if not self.lost else out_box,
                float(score))
