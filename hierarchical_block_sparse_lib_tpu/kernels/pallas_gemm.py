"""Fused gather -> MXU GEMM -> segment-accumulate Pallas kernel.

The numeric phase of hierarchical SpGEMM (BASELINE.json:5 "recursive
multiply dispatch -> batched Pallas GEMM with block-pair gather") as ONE
kernel: for each contributing block pair p, gather A[a_idx[p]] and
B[b_idx[p]] from HBM, multiply on the MXU, and accumulate into output
block seg[p] — without materializing the [pairs, b, b] gathered copies
or the per-pair product tensor that a naive XLA path writes to HBM.

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

Scale-out past SMEM: scalar-prefetch operands live in SMEM (~1 MB), so
one call handles at most ~40k pairs.  `gather_gemm_accumulate` chunks
the (c-sorted) pair list and runs one call per chunk; chunks after the
first read the output-so-far back through an aliased carry-in operand
(`cin`), whose per-window block is fetched on the window's first visit:
`out[w] = cin[w] + prod`.  Segments spanning a chunk boundary therefore
accumulate exactly, at the cost of one extra out-block read per chunk
boundary — negligible against the per-pair gather traffic.

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
    # Mosaic's dot lowering supports only DEFAULT/HIGHEST; 'high' maps to
    # HIGHEST here (the XLA backend honors true HIGH).
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}

# Scalar-prefetch budget: 3 int32 arrays per call must fit SMEM (~1 MB)
# alongside control state.  3 * 24576 * 4B = 288 KB.
PAIR_CHUNK = 24576


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


def _kernel_cin(
    a_idx_ref, b_idx_ref, seg_ref, a_ref, b_ref, cin_ref, o_ref, *, precision
):
    """Accumulating variant: on a window's first visit, seed from the
    aliased carry-in block (the output of the previous chunk's call)."""
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
        o_ref[0] = cin_ref[0] + prod

    @pl.when(jnp.logical_not(is_first))
    def _():
        o_ref[0] += prod


def _call_one_chunk(
    a_data, b_data, a_idx, b_idx, seg, cin, out_cap, precision, interpret
):
    """One pallas_call over <= PAIR_CHUNK pairs.  cin=None: first chunk
    (windows initialize from the product); else accumulate onto cin."""
    pairs = a_idx.shape[0]
    b = a_data.shape[-1]
    in_specs = [
        pl.BlockSpec((1, b, b), lambda p, ai, bi, sg: (ai[p], 0, 0)),
        pl.BlockSpec((1, b, b), lambda p, ai, bi, sg: (bi[p], 0, 0)),
    ]
    operands = [a_idx, b_idx, seg, a_data, b_data]
    if cin is not None:
        in_specs.append(
            pl.BlockSpec((1, b, b), lambda p, ai, bi, sg: (sg[p], 0, 0))
        )
        operands.append(cin)
        kernel = _kernel_cin
        # Alias cin (operand index 5 incl. the 3 scalar-prefetch args)
        # to the output: accumulation stays in-place in HBM.
        io_alias = {5: 0}
    else:
        kernel = _kernel
        io_alias = {}
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(pairs,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, b, b), lambda p, ai, bi, sg: (sg[p], 0, 0)
        ),
    )
    flops_per_pair = 2 * b * b * b * (3 if precision == "highest" else 1)
    return pl.pallas_call(
        functools.partial(kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (out_cap + 1, b, b), jnp.float32, vma=vma
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * pairs,
            bytes_accessed=pairs * 2 * b * b * a_data.dtype.itemsize,
            transcendentals=0,
        ),
        input_output_aliases=io_alias,
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit, static_argnames=("out_cap", "precision", "interpret", "chunk")
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
    chunk: int = PAIR_CHUNK,
) -> jax.Array:
    """Returns f32[out_cap, b, b] segment-accumulated block products.

    Handles any pair count: the pair list is split into SMEM-sized
    chunks executed as sequential aliased pallas_calls (see module doc).
    """
    pairs = a_idx.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if pairs <= chunk:
        # Single call: windows never visited by the grid keep undefined
        # buffer content — the caller (spgemm) masks padding slots.
        out = _call_one_chunk(
            a_data, b_data, a_idx, b_idx, seg, None, out_cap, precision,
            interpret,
        )
        return out[:out_cap]

    n_chunks = -(-pairs // chunk)
    pad = n_chunks * chunk - pairs
    if pad:
        a_idx = jnp.concatenate([a_idx, jnp.zeros((pad,), jnp.int32)])
        b_idx = jnp.concatenate([b_idx, jnp.zeros((pad,), jnp.int32)])
        seg = jnp.concatenate(
            [seg, jnp.full((pad,), out_cap, jnp.int32)]
        )
    b = a_data.shape[-1]
    # Every chunk (incl. the first) accumulates onto the carried buffer:
    # a window visited for the first time in chunk c seeds from cin,
    # which holds zeros (or earlier chunks' partials) — never-visited
    # windows pass through as zeros in-place via the aliasing.
    out = jnp.zeros((out_cap + 1, b, b), jnp.float32)
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        out = _call_one_chunk(
            a_data, b_data, a_idx[sl], b_idx[sl], seg[sl], out, out_cap,
            precision, interpret,
        )
    return out[:out_cap]
