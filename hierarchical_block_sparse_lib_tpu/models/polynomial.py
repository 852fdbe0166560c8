"""Matrix polynomials over the block-sparse format.

The general matrix-polynomial workload behind BASELINE.json:9: evaluate
p(A) = sum_k c_k A^k with per-power norm truncation (Horner form), and a
Chebyshev recurrence variant.  Every power is a hierarchical SpGEMM; the
truncation threshold gives the reference's error-controlled sparse
approximate multiplication semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp

from hierarchical_block_sparse_lib_tpu.core.block_matrix import BlockMatrix
from hierarchical_block_sparse_lib_tpu.core.assembly import eye
from hierarchical_block_sparse_lib_tpu.ops import basic
from hierarchical_block_sparse_lib_tpu.ops.spgemm import make_plan, spgemm
from hierarchical_block_sparse_lib_tpu.ops.truncate import truncate


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HornerPlans:
    """Per-step structural plans for a fixed Horner trajectory
    (`plan_polynomial`).  Unlike the Chebyshev iterates, Horner's
    supports depend on the COEFFICIENTS (truncation sees c_k*I folded
    into the accumulator), so plans are per-(A, coeffs, tau) — the reuse
    regime is repeated evaluation under data drift with frozen
    structure."""

    mul_plans: tuple  # tuple[SymbolicPlan with union fields]
    exp_acc: tuple  # tuple[int32[...]] expected accumulator ids
    exp_a: jax.Array  # int32[cap] expected ids of the CONSTANT operand A


def plan_polynomial(
    a: BlockMatrix,
    coeffs: Sequence[float],
    tau: float,
    pair_cap: int,
    out_cap: int,
    backend: str = "auto",
) -> HornerPlans:
    """Walk the Horner evaluation once and capture every step's
    symbolic+union plan for ``polynomial(..., plans=...)``."""
    _, _, _, plans = _horner(
        a, coeffs, tau, pair_cap, out_cap, backend, plans=None,
        capture=True,
    )
    return plans


def polynomial(
    a: BlockMatrix,
    coeffs: Sequence[float],
    tau: float,
    pair_cap: int,
    out_cap: int,
    backend: str = "auto",
    plans: HornerPlans | None = None,
):
    """Horner evaluation p(A) = c0 I + c1 A + ... + cn A^n with truncation
    after every multiply.  Returns (P, total_block_pairs, overflow):
    `overflow` is True if any multiply exceeded pair_cap/out_cap (result
    then incomplete — raise the caps).

    `plans` (from `plan_polynomial` at the same coeffs/caps/tau) freezes
    every step's structure; drift is folded into the overflow flag."""
    p, total, ovf, _ = _horner(
        a, coeffs, tau, pair_cap, out_cap, backend, plans=plans,
        capture=False,
    )
    return p, total, ovf


def _horner(
    a: BlockMatrix,
    coeffs: Sequence[float],
    tau: float,
    pair_cap: int,
    out_cap: int,
    backend: str,
    plans: HornerPlans | None,
    capture: bool,
):
    n = a.n_rows
    ident = eye(n, a.block_size, dtype=a.dtype, cap=a.nb_rows)
    acc = basic.scale(ident, coeffs[-1])
    total_pairs = jnp.zeros((), jnp.int32)
    overflow = jnp.zeros((), bool)
    mul_plans, exp_acc = [], []
    if plans is not None:
        # The constant operand's own structure must match the plan too —
        # the accumulator starts as c_n*I regardless of A, so a drifted
        # A would otherwise produce silently-stale step-1 products.  A
        # capacity change is drift too (flagged, not crashed).
        if a.ids.shape != plans.exp_a.shape:
            overflow = overflow | jnp.ones((), bool)
        else:
            overflow = overflow | jnp.any(a.ids != plans.exp_a)
    for k, c in enumerate(reversed(coeffs[:-1])):
        if capture:
            mul_plans.append(
                make_plan(
                    acc, a, pair_cap, accum_ids=ident.ids, out_cap=out_cap
                )
            )
            exp_acc.append(acc.ids)
        mp = mul_plans[-1] if capture else (
            plans.mul_plans[k] if plans is not None else None
        )
        if plans is not None:
            overflow = overflow | jnp.any(acc.ids != plans.exp_acc[k])
        # Horner step acc <- acc@A + c*I in ONE structural pass via the
        # fused beta-accumulate; a union overflow (support past out_cap,
        # previously a silent repack drop) is reported via out_overflow.
        acc, info = spgemm(
            acc, a, pair_cap=pair_cap, out_cap=out_cap, backend=backend,
            accum=ident, beta=c, plan=mp,
        )
        total_pairs = total_pairs + info.n_block_pairs
        overflow = (
            overflow | info.pair_overflow | info.out_overflow
            | info.row_overflow
        )
        acc = truncate(acc, tau)
    hp = (
        HornerPlans(
            mul_plans=tuple(mul_plans), exp_acc=tuple(exp_acc),
            exp_a=a.ids,
        )
        if capture
        else None
    )
    return acc, total_pairs, overflow, hp
