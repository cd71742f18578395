"""Linear assignment on device (auction algorithm) + host exact path.

The reference solves detection->track association with lap/scipy
Hungarian on host per frame (``sort.py:137-161``).  On TPU we run a
Bertsekas auction instead: rounds of (bid, assign) that are pure
max/argmax/scatter ops inside a ``lax.while_loop`` — no host sync in
the tracking inner loop.

Termination on rectangular / infeasible problems: a row *retires* once
its best net value drops below the reserve ``floor`` (prices only rise,
so retirement is permanent — equivalent to assigning a private dummy
column).  With bid increment ``eps`` the assignment is within
``n * eps`` of optimal; benefits are internally shifted so the feasible
minimum is 0, so for IoU-style payoffs quantized coarser than ``eps``
the result matches Hungarian exactly.

``linear_assignment_host`` (scipy) is the bit-exact host fallback used
as the test oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


@partial(jax.jit, static_argnames=("max_iters",))
def auction_assign(benefit, eps=5e-5, floor=-1e-3, max_iters=200_000):
    """Maximize sum of ``benefit[i, owner[i]]`` over one-to-one matches.

    Args:
      benefit: ``[N, M]`` payoff matrix (entries <= ``NEG/2`` forbidden).

    Returns:
      ``row_to_col [N]`` int32, -1 for unassigned rows.
    """
    n, m = benefit.shape
    if n == 0 or m == 0:
        return jnp.full((n,), -1, jnp.int32)

    feasible = benefit > NEG / 2
    has_option = jnp.any(feasible, axis=1)
    minb = jnp.min(jnp.where(feasible, benefit, jnp.inf))
    minb = jnp.where(jnp.isfinite(minb), jnp.minimum(minb, 0.0), 0.0)
    b = jnp.where(feasible, benefit - minb, NEG).astype(jnp.float32)

    def cond(carry):
        row_to_col, _, retired, it = carry
        active = (row_to_col < 0) & has_option & ~retired
        return jnp.any(active) & (it < max_iters)

    def body(carry):
        row_to_col, price, retired, it = carry
        value = b - price[None, :]
        best_col = jnp.argmax(value, axis=1)
        best_val = jnp.max(value, axis=1)
        masked = value.at[jnp.arange(n), best_col].set(NEG)
        second_val = jnp.maximum(jnp.max(masked, axis=1), floor)
        bid = best_val - second_val + eps

        active = (row_to_col < 0) & has_option & ~retired
        # Rows whose best option is now worse than the reserve retire
        # for good (prices never fall).
        retire_now = active & (best_val < floor)
        retired = retired | retire_now
        bidding = active & ~retire_now

        bid_matrix = jnp.where(
            bidding[:, None] & jax.nn.one_hot(best_col, m, dtype=bool),
            bid[:, None], -jnp.inf)
        win_bid = jnp.max(bid_matrix, axis=0)
        win_row = jnp.argmax(bid_matrix, axis=0)
        contested = win_bid > -jnp.inf

        # Evict previous owners of contested columns.
        evicted = (row_to_col >= 0) & contested[
            jnp.maximum(row_to_col, 0)]
        row_to_col = jnp.where(evicted, -1, row_to_col)
        # Assign winners.
        col_ids = jnp.arange(m)
        row_to_col = row_to_col.at[
            jnp.where(contested, win_row, n)].set(
                jnp.where(contested, col_ids, -1), mode="drop")
        price = jnp.where(contested, price + win_bid, price)
        return row_to_col, price, retired, it + 1

    init = (jnp.full((n,), -1, jnp.int32),
            jnp.zeros((m,), jnp.float32),
            jnp.zeros((n,), bool),
            jnp.zeros((), jnp.int32))
    row_to_col, _, _, _ = jax.lax.while_loop(cond, body, init)
    return row_to_col


@partial(jax.jit, static_argnames=("unrolled_rounds",))
def greedy_assign(benefit, unrolled_rounds=6):
    """Sequential-greedy matching (global max first), computed in
    parallel rounds of *mutual-best* pairing.

    Each round simultaneously matches every (row, col) pair that are
    each other's argmax among the unmatched — a set that always
    contains the current global maximum and whose members cannot
    interfere, so the fixpoint equals the sequential greedy matching.
    Rounds needed = length of the longest "next-best" chain (typically
    < 5); every round is dense max/argmax work, no serial N-step scan.

    The first ``unrolled_rounds`` rounds are UNROLLED straight-line
    code (XLA can fuse and pipeline them — inside the tracker's
    per-frame scan a dynamic-trip-count while_loop is a serialization
    point that measurably dominates the SORT step, see
    experiments/sort_scan_bench.py); the rare longer chains finish in
    a while_loop that usually runs zero iterations, so the result is
    EXACTLY the greedy fixpoint for every input.

    Greedy differs from Hungarian only when taking a locally-best pair
    forces a worse total — rare under IoU gating; SORT exposes both
    (``assignment=`` parameter) and the tests quantify agreement.

    Returns ``row_to_col [N]`` int32, -1 unassigned.
    """
    n, m = benefit.shape
    if n == 0 or m == 0:
        return jnp.full((n,), -1, jnp.int32)
    b0 = jnp.where(benefit > NEG / 2, benefit.astype(jnp.float32), NEG)

    def body(carry):
        b, r2c, it = carry
        best_col = jnp.argmax(b, axis=1)             # [n]
        best_val = jnp.max(b, axis=1)
        best_row = jnp.argmax(b, axis=0)             # [m]
        mutual = ((best_row[best_col] == jnp.arange(n))
                  & (best_val > NEG / 2))
        r2c = jnp.where(mutual, best_col.astype(jnp.int32), r2c)
        col_taken = jnp.zeros((m,), bool).at[
            jnp.where(mutual, best_col, m)].set(True, mode="drop")
        b = jnp.where(mutual[:, None] | col_taken[None, :], NEG, b)
        return b, r2c, it + 1

    carry = (b0, jnp.full((n,), -1, jnp.int32),
             jnp.zeros((), jnp.int32))
    for _ in range(min(unrolled_rounds, n)):
        carry = body(carry)

    def cond(c):
        b, r2c, it = c
        return jnp.any(jnp.max(b, axis=1) > NEG / 2) & (it < n)

    _, r2c, _ = jax.lax.while_loop(cond, body, carry)
    return r2c


def linear_assignment_host(cost):
    """Exact Hungarian via scipy (host), minimizing cost.

    Returns ``[K, 2]`` (row, col) pairs, matching the reference's
    ``linear_assignment`` contract (``sort.py:16-26``).
    """
    from scipy.optimize import linear_sum_assignment

    rows, cols = linear_sum_assignment(np.asarray(cost))
    return np.stack([rows, cols], axis=1)
