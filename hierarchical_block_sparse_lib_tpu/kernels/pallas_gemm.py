"""Fused gather -> MXU GEMM -> segment-accumulate Pallas kernel.

The numeric phase of hierarchical SpGEMM (BASELINE.json:5 "recursive
multiply dispatch -> batched Pallas GEMM with block-pair gather") as ONE
kernel: for each contributing block pair p, gather A[a_idx[p]] and
B[b_idx[p]] from HBM, multiply on the MXU, and accumulate into output
block seg[p] — without materializing the [pairs, b, b] gathered copies
or the per-pair product tensor that the XLA path writes to HBM.

How it works:
- `a_idx`/`b_idx`/`seg` ride in as scalar-prefetch operands, so each
  grid step's BlockSpec index_map *is* the gather: Pallas's pipeline
  machinery double-buffers the indexed HBM->VMEM block DMAs against the
  MXU work automatically.
- Pairs arrive sorted by output segment (spgemm_symbolic guarantees it),
  so each output block is revisited by a contiguous run of grid steps:
  the block stays resident in VMEM for its whole run (Pallas only
  flushes when the out index_map changes), giving serial, atomics-free
  accumulation — the plan of SURVEY.md section 8.5.
- Invalid (padding) pairs carry seg == out_cap: they accumulate into a
  trash block that the caller slices off.

Arithmetic intensity is b/4 FLOP/byte (f32), so b=128 blocks run this
kernel at the HBM roofline; bf16 data at precision='default' doubles it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _kernel(a_idx_ref, b_idx_ref, seg_ref, a_ref, b_ref, o_ref, *, precision):
    p = pl.program_id(0)
    seg_here = seg_ref[p]
    seg_prev = seg_ref[jnp.maximum(p - 1, 0)]
    is_first = jnp.logical_or(p == 0, seg_here != seg_prev)

    prod = jax.lax.dot_general(
        a_ref[0],
        b_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION[precision],
    )

    @pl.when(is_first)
    def _():
        o_ref[0] = prod

    @pl.when(jnp.logical_not(is_first))
    def _():
        o_ref[0] += prod


@functools.partial(
    jax.jit, static_argnames=("out_cap", "precision", "interpret")
)
def gather_gemm_accumulate(
    a_data: jax.Array,  # [capA, b, b]
    b_data: jax.Array,  # [capB, b, b]
    a_idx: jax.Array,  # int32[pairs]
    b_idx: jax.Array,  # int32[pairs]
    seg: jax.Array,  # int32[pairs], sorted; == out_cap for padding pairs
    out_cap: int,
    precision: str = "highest",
    interpret: bool | None = None,
) -> jax.Array:
    """Returns f32[out_cap, b, b] segment-accumulated block products."""
    pairs = a_idx.shape[0]
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pairs,),
        in_specs=[
            pl.BlockSpec(
                (1, b, b),
                lambda p, ai, bi, sg: (ai[p], 0, 0),
            ),
            pl.BlockSpec(
                (1, b, b),
                lambda p, ai, bi, sg: (bi[p], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b, b),
            lambda p, ai, bi, sg: (sg[p], 0, 0),
        ),
    )
    flops_per_pair = 2 * b * b * b * (3 if precision == "highest" else 1)
    out = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_cap + 1, b, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * pairs,
            bytes_accessed=pairs * 2 * b * b * a_data.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_idx, b_idx, seg, a_data, b_data)
    return out[:out_cap]
