"""Analytic FLOP counting by jaxpr traversal.

XLA's ``compiled.cost_analysis()`` under-reports TPU convolutions
(they lower to custom calls whose flops the analysis does not model),
so MFU numerators come from the program's OWN math: walk the closed
jaxpr, count ``2*M*N*K`` per ``dot_general`` and the standard
``2 * out_positions * kernel_volume * C_in/groups * C_out`` per
``conv_general_dilated``, and recurse through the structured
primitives (``scan`` multiplies by trip count, ``while`` counts one
iteration, ``cond`` takes the widest branch).

Pallas kernels are opaque to the jaxpr, so count a pipeline built with
its XLA reference paths (e.g. ``pooling='packed'``) — the algorithmic
FLOPs are identical by the parity tests.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_general_flops(eqn):
    lhs, rhs = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
    (lc, rc), (lb, _rb) = eqn.params["dimension_numbers"]
    batch = _prod(lhs[i] for i in lb)
    k = _prod(lhs[i] for i in lc)
    m = _prod(lhs[i] for i in range(len(lhs))
              if i not in lc and i not in lb)
    n = _prod(rhs[i] for i in range(len(rhs))
              if i not in rc and i not in _rb)
    return 2 * batch * m * k * n


def _conv_flops(eqn):
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    batch_g = int(eqn.params.get("batch_group_count", 1))
    kernel_spatial = _prod(rhs[i] for i in dn.rhs_spec[2:])
    c_in = rhs[dn.rhs_spec[1]]  # per-group input channels
    out_positions = _prod(out)  # batch * spatial * C_out
    return 2 * out_positions * kernel_spatial * c_in // max(
        batch_g, 1)


def count_jaxpr_flops(jaxpr):
    """Total matmul/conv FLOPs of one (open) jaxpr."""
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_general_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            total += int(eqn.params["length"]) * count_jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif prim == "while":
            # Trip count is dynamic; count ONE iteration (documented
            # under-count — prefer scan/unrolled loops in measured
            # programs).
            total += count_jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            total += max(
                (count_jaxpr_flops(b.jaxpr)
                 for b in eqn.params["branches"]), default=0)
        else:
            # Generic recursion: pjit/closed_call/remat/custom_jvp/
            # custom_vjp all carry their body under one of these keys.
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is None:
                    continue
                inner = getattr(sub, "jaxpr", sub)
                total += count_jaxpr_flops(inner)
                break
    return total


def count_flops(fn, *args, **kwargs):
    """Matmul/conv FLOPs of ``fn(*args, **kwargs)`` (one call).

    Traces only — no compilation, no device execution; args may be
    ``jax.ShapeDtypeStruct``.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_jaxpr_flops(closed.jaxpr)


def resnet50_reference_flops(h, w, frames=1):
    """Closed-form R50 trunk FLOPs at ``h x w`` (sanity anchor for
    tests; classic-stem variant, no FC head).

    The literature's "4.09 GFLOPs @ 224" counts multiply-accumulates;
    MFU convention (and this module) counts 2 FLOPs per MAC, so the
    anchor is 8.18e9 at 224x224.
    """
    return 2 * 4.09e9 * (h * w) / (224 * 224) * frames
