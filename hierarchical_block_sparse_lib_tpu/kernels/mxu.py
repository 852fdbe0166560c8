"""Shared MXU contraction helper for the Pallas SpGEMM kernels.

Mosaic's dot lowering exposes only DEFAULT (1-pass bf16) and HIGHEST
(multi-pass, f32-faithful).  XLA's Precision.HIGH on TPU is the 3-pass
bf16 algorithm; `make_mxu_dot` reproduces it with a manual hi/lo bf16
split so the Pallas kernels can offer the same three-tier precision
surface as the XLA backend (see ops/spgemm.py docstring for measured
guidance on when each tier wins).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def make_mxu_dot(precision: str):
    """Return dot(a, b, dimension_numbers) -> f32 at the requested
    precision.  'high' is the 3-pass bf16 split (XLA Precision.HIGH,
    which Mosaic's dot cannot express): a = hi + lo with hi = bf16(a),
    and a@b ~= hi_a@hi_b + hi_a@lo_b + lo_a@hi_b (the lo@lo term is
    below the f32 accumulation floor).  Each pass is a native 1-pass
    bf16 MXU dot; the VPU split work is O(b^2) against O(b^3) MXU
    work."""

    def mxu_dot(a_v, b_v, dn):
        if precision == "high":
            d = lambda x, y: jax.lax.dot_general(  # noqa: E731
                x, y, dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            a_hi = a_v.astype(jnp.bfloat16)
            b_hi = b_v.astype(jnp.bfloat16)
            a_lo = (a_v - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_lo = (b_v - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
        return jax.lax.dot_general(
            a_v, b_v, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=PRECISION[precision],
        )

    return mxu_dot
