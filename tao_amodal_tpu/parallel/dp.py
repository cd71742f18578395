"""Data-parallel training step under jit + NamedSharding.

Semantics-parity with the reference's hand-rolled DP
(``pysot/utils/distributed.py``): parameter broadcast == replicated
sharding at placement; per-parameter gradient all-reduce with
averaging (``reduce_gradients(_type='avg')``, ``distributed.py:126``)
== XLA's automatic reduce over the sharded batch axis of the loss
mean; ``average_reduce`` of scalar metrics == returning sharded-mean
scalars.  No process groups, no manual broadcasts, no degraded
single-process fallback path — the same jitted function runs on 1 or N
devices.
"""

from __future__ import annotations

import jax
import optax

from tao_amodal_tpu.parallel.mesh import data_sharding, replicated


def make_train_step(loss_fn, optimizer, mesh, donate=True,
                    param_sharding=None):
    """Build a jitted data-parallel train step.

    Args:
      loss_fn: ``(params, batch, rng) -> (loss, aux)``; the batch's
        leading axis is sharded over 'data'; loss must be a mean over
        the batch (so XLA's cross-shard mean matches the reference's
        averaged all-reduce).
      optimizer: an optax GradientTransformation.
      param_sharding: None (default) replicates the state across the
        mesh — pure DP.  Pass a ``NamedSharding`` pytree (e.g.
        ``parallel.tp.tp_param_shardings``) for hybrid TP+DP: the
        caller places ``params`` per that tree (``parallel.tp.place_tp``)
        and builds ``opt_state`` under jit from the placed params so
        its param-shaped leaves inherit the same layout; the step then
        preserves the committed placements instead of constraining to
        replicated (gradients of 'model'-sharded weights come out
        sharded, and their optimizer update runs sharded too).

    Returns ``step(state, batch, rng) -> (state, metrics)`` where
    ``state = (params, opt_state)``.
    """

    def step(state, batch, rng):
        params, opt_state = state
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm, **aux}
        return (params, opt_state), metrics

    rep = replicated(mesh)
    dat = data_sharding(mesh)
    if param_sharding is None:
        return jax.jit(
            step,
            in_shardings=((rep, rep), dat, rep),
            out_shardings=((rep, rep), rep),
            donate_argnums=(0,) if donate else (),
        )
    # Hybrid TP+DP: state shardings come from the arguments' committed
    # placements (None = unspecified); only batch/rng/metrics are
    # constrained.  GSPMD propagates the Megatron column/row kernel
    # shardings through fwd+bwd+update and inserts the head
    # all-reduces plus the cross-'data' grad reduction.
    return jax.jit(
        step,
        in_shardings=(None, dat, rep),
        out_shardings=(None, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(metric_fn, mesh):
    """Jitted data-parallel eval step: batch sharded, outputs
    replicated (cross-device means are XLA-inserted)."""
    rep = replicated(mesh)
    dat = data_sharding(mesh)
    return jax.jit(metric_fn, in_shardings=(rep, dat),
                   out_shardings=rep)
