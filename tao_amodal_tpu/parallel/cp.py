"""Context(frame)-parallel track IoU over the mesh.

The video-length analog of sequence parallelism (survey §5): 3D track
IoU is ``sum_f I / sum_f U``, which decomposes exactly over frame
shards.  Each device computes partial (I, U) over its frame slice via
:func:`tao_amodal_tpu.ops.track_iou.track_iou_partials`; a ``psum``
over the 'data' axis yields the exact global matrix.  This lets the
eval of very long clips scale with chip count without changing a
single metric bit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tao_amodal_tpu.ops.track_iou import track_iou_partials


def sharded_track_iou(mesh, dt_boxes, dt_valid, gt_boxes, gt_valid):
    """Exact 3D track-IoU matrix with frames sharded over 'data'.

    Args:
      dt_boxes: ``[D, F, 4]`` with F divisible by the data-axis size.
      gt_boxes: ``[G, F, 4]``.

    Returns ``[D, G]`` (replicated).
    """

    def kernel(db, dv, gb, gv):
        i_part, u_part = track_iou_partials(db, dv, gb, gv)
        i_tot = jax.lax.psum(i_part, "data")
        u_tot = jax.lax.psum(u_part, "data")
        return jnp.where(u_tot > 0, i_tot / jnp.where(u_tot > 0, u_tot,
                                                      1.0), 0.0)

    shard = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, "data", None), P(None, "data"),
                  P(None, "data", None), P(None, "data")),
        out_specs=P(),
    )
    return shard(dt_boxes, dt_valid, gt_boxes, gt_valid)
