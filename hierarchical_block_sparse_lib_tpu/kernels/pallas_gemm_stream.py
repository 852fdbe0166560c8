"""Streaming gather-GEMM-accumulate: manual-DMA Pallas kernel.

Second-generation numeric phase for hierarchical SpGEMM (v1:
`pallas_gemm.py`).  The v1 kernel maps one block pair to one grid step
and lets the Pallas pipeline do the indexed HBM->VMEM fetches; that is
correct but pays fixed per-grid-step cost (~1.3 us observed on v5e) that
dwarfs the 160 ns roofline time of a 2x64 KB pair fetch — and its
scalar-prefetch operands cap one call at ~40k pairs of SMEM.

This kernel instead runs a grid over *chunks* of pairs and hand-rolls
the pipeline (pallas_guide.md "Patterns: Double Buffering"):

- `a_idx`/`b_idx`/`seg` stream through per-chunk SMEM windows (no
  whole-array SMEM residency -> no pair-count limit, one call total);
- a DEPTH-deep queue of async copies fetches A/B leaf blocks from HBM
  (`memory_space=ANY`) into VMEM slots, so ~DEPTH pair fetches are in
  flight while the MXU multiplies the current pair;
- output accumulation uses two alternating VMEM accumulators: a
  segment's pairs accumulate into one; on segment change the finished
  accumulator is DMA'd to its output block in HBM while the other
  starts the next segment (atomics-free serial accumulation — the
  c-sorted pair list guarantees each output is one contiguous run);
- all cross-step state (current segment, queue/store bookkeeping) lives
  in SMEM/VMEM scratch, which persists across grid steps.

Untouched output blocks keep undefined HBM content — the caller masks
padding slots (spgemm does; see the slot_valid mask there).

Per-pair cost at b=128/f32 is bounded by max(2x64 KB HBM fetch,
one (or three at precision='highest') 128^3 MXU passes) ~ 160-200 ns —
speed-of-light for this data layout.
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

DEPTH = 8  # outstanding pair fetches
CHUNK = 2048  # pairs per grid step (SMEM: 3 * CHUNK * 4B = 24 KB)


def _make_kernel(chunk: int, precision: str, b: int):
    def kernel(
        a_idx_ref,  # SMEM int32[chunk] (this chunk's window)
        b_idx_ref,  # SMEM int32[chunk]
        seg_ref,  # SMEM int32[chunk], sorted across the whole call
        a_hbm,  # ANY  [capA, b, b]
        b_hbm,  # ANY  [capB, b, b]
        o_hbm,  # ANY  [out_cap+1, b, b] f32 output
        ab_buf,  # VMEM [DEPTH, 2, b, b] input-dtype fetch slots
        acc,  # VMEM [2, b, b] f32 alternating accumulators
        state,  # SMEM int32[8]: 0:cur_seg 1:acc_parity 2:n_flushes
        load_sems,  # DMA sems [DEPTH, 2]
        store_sems,  # DMA sems [2]
    ):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def load_pair(t):
            slot = jax.lax.rem(t, DEPTH)
            pltpu.make_async_copy(
                a_hbm.at[a_idx_ref[t]], ab_buf.at[slot, 0], load_sems.at[slot, 0]
            ).start()
            pltpu.make_async_copy(
                b_hbm.at[b_idx_ref[t]], ab_buf.at[slot, 1], load_sems.at[slot, 1]
            ).start()

        def wait_pair(t):
            slot = jax.lax.rem(t, DEPTH)
            pltpu.make_async_copy(
                a_hbm.at[a_idx_ref[t]], ab_buf.at[slot, 0], load_sems.at[slot, 0]
            ).wait()
            pltpu.make_async_copy(
                b_hbm.at[b_idx_ref[t]], ab_buf.at[slot, 1], load_sems.at[slot, 1]
            ).wait()

        def wait_store(par):
            # Reconstruct a same-shaped descriptor; the wait consumes the
            # semaphore count for one acc-sized transfer.
            pltpu.make_async_copy(
                acc.at[par], o_hbm.at[0], store_sems.at[par]
            ).wait()

        def start_store(par, dst_seg):
            pltpu.make_async_copy(
                acc.at[par], o_hbm.at[dst_seg], store_sems.at[par]
            ).start()

        @pl.when(i == 0)
        def _():
            state[0] = -1  # current segment (none yet)
            state[1] = 0  # accumulator parity
            state[2] = 0  # flushes issued

        # Prologue: fill the fetch queue (DEPTH-1 lookahead: pair
        # t+DEPTH-1 lands in slot (t-1)%DEPTH, which the *previous*
        # iteration's dot has already consumed — never the live slot).
        for t in range(DEPTH - 1):
            if t < chunk:
                load_pair(t)

        def body(t, _):
            @pl.when(t + DEPTH - 1 < chunk)
            def _():
                load_pair(t + DEPTH - 1)

            wait_pair(t)
            slot = jax.lax.rem(t, DEPTH)
            prod = jax.lax.dot_general(
                ab_buf[slot, 0],
                ab_buf[slot, 1],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_PRECISION[precision],
            )
            seg_t = seg_ref[t]
            cur = state[0]
            par = state[1]
            is_new = seg_t != cur

            @pl.when(is_new)
            def _():
                # Flush the finished segment (if any) from parity `par`,
                # then start the new one on the other parity.
                @pl.when(cur >= 0)
                def _():
                    start_store(par, cur)
                    state[2] = state[2] + 1

                new_par = 1 - par

                # Stores strictly alternate parity, so parity `new_par`
                # has an un-waited store in flight iff at least two
                # stores were ever issued (its last one was 2 flushes
                # ago, or just-now-minus-one) — drain it before
                # overwriting its accumulator.
                @pl.when(state[2] >= 2)
                def _():
                    wait_store(new_par)

                acc[new_par] = prod
                state[0] = seg_t
                state[1] = new_par

            @pl.when(jnp.logical_not(is_new))
            def _():
                acc[par] += prod

            return 0

        jax.lax.fori_loop(0, chunk, body, 0, unroll=False)

        # Epilogue on the last grid step: flush the live accumulator and
        # drain every outstanding store.
        @pl.when(i == n_steps - 1)
        def _():
            par = state[1]

            @pl.when(state[0] >= 0)
            def _():
                @pl.when(state[2] >= 1)
                def _():
                    wait_store(1 - par)

                start_store(par, state[0])
                wait_store(par)

        return

    return kernel


@functools.partial(
    jax.jit, static_argnames=("out_cap", "precision", "interpret", "chunk")
)
def gather_gemm_accumulate_stream(
    a_data: jax.Array,  # [capA, b, b]
    b_data: jax.Array,  # [capB, b, b]
    a_idx: jax.Array,  # int32[pairs]
    b_idx: jax.Array,  # int32[pairs], seg-sorted together with a_idx
    seg: jax.Array,  # int32[pairs], sorted; == out_cap for padding pairs
    out_cap: int,
    precision: str = "highest",
    interpret: bool | None = None,
    chunk: int = CHUNK,
) -> jax.Array:
    """f32[out_cap, b, b] segment-accumulated block products (one call,
    any pair count).  Padding slots of the result are undefined — callers
    mask by segment validity (spgemm does)."""
    pairs = a_idx.shape[0]
    b = a_data.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    c = min(chunk, max(pairs, 1))
    n_chunks = -(-pairs // c) if pairs else 1
    padded = n_chunks * c
    if padded != pairs:
        pad = padded - pairs
        a_idx = jnp.concatenate([a_idx, jnp.zeros((pad,), jnp.int32)])
        b_idx = jnp.concatenate([b_idx, jnp.zeros((pad,), jnp.int32)])
        seg = jnp.concatenate([seg, jnp.full((pad,), out_cap, jnp.int32)])

    kernel = _make_kernel(c, precision, b)
    vma = getattr(jax.typeof(a_data), "vma", frozenset())
    flops_per_pair = 2 * b * b * b * (3 if precision == "highest" else 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((c,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((c,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((c,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, 2, b, b), a_data.dtype),
            pltpu.VMEM((2, b, b), jnp.float32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((DEPTH, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (out_cap + 1, b, b), jnp.float32, vma=vma
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * padded,
            bytes_accessed=padded * 2 * b * b * a_data.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(a_idx, b_idx, seg, a_data, b_data)
    return out[:out_cap]
