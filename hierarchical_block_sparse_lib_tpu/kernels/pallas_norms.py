"""Fused per-block norm reduction Pallas kernels.

The reference's truncation/norm pass is a post-order tree walk summing
squares at leaves (SURVEY.md section 4.3/4.4); the mandated TPU-native
equivalent is a fused Pallas reduction (BASELINE.json:5 "truncation/norm
pass -> fused Pallas reduction"): one streaming pass over the leaf-block
tensor in HBM producing per-block squared Frobenius norms — the input to
truncation masks, SpAMM pair filtering, and hierarchical subtree norms.

The kernel fuses square + reduce + (optionally) the tau^2 compare into a
single HBM read of the data; at [cap, b, b] sizes this runs at the HBM
roofline.  `norms_and_keep` also emits the keep mask for truncate so the
threshold compare costs no extra pass.

Layout note (learned on-silicon): Mosaic rejects rank-1 stores and
(1, c) windows here, so the per-block scalars are produced as a
[padded_cap, 1] column — the whole column stays resident as one VMEM
window and each grid step writes its c-row slice at a dynamic sublane
offset (c is a multiple of 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Blocks reduced per grid step (VMEM window: CHUNK * b * b * 4B;
# 32 * 128 * 128 * 4B = 2 MB, double-buffered by the pipeline).
_BLOCK_CHUNK = 32


def _norms_kernel(x_ref, n2_ref):
    i = pl.program_id(0)
    c = x_ref.shape[1]
    x = x_ref[0].astype(jnp.float32).reshape(c, -1)
    n2_ref[pl.ds(i * c, c), :] = jnp.sum(x * x, axis=1, keepdims=True)


def _norms_keep_kernel(tau2_ref, x_ref, n2_ref, keep_ref):
    i = pl.program_id(0)
    c = x_ref.shape[1]
    x = x_ref[0].astype(jnp.float32).reshape(c, -1)
    n2 = jnp.sum(x * x, axis=1, keepdims=True)
    n2_ref[pl.ds(i * c, c), :] = n2
    keep_ref[pl.ds(i * c, c), :] = (n2 > tau2_ref[0]).astype(jnp.int32)


def _pad_reshape(data: jax.Array, chunk: int):
    cap = data.shape[0]
    c = min(chunk, max(cap, 8))
    c = -(-c // 8) * 8  # dynamic sublane offsets need 8-row alignment
    n_steps = -(-cap // c)
    padded = n_steps * c
    if padded != cap:
        data = jnp.concatenate(
            [data, jnp.zeros((padded - cap,) + data.shape[1:], data.dtype)]
        )
    b = data.shape[-1]
    return data.reshape(n_steps, c, b, b), n_steps, c


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def block_frob_squared(
    data: jax.Array,  # [cap, b, b]
    interpret: bool | None = None,
    chunk: int = _BLOCK_CHUNK,
) -> jax.Array:
    """f32[cap] squared Frobenius norm per block, one fused HBM pass.
    Zero-padding blocks reduce to 0, preserving the storage invariant."""
    cap = data.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x, n_steps, c = _pad_reshape(data, chunk)
    b = data.shape[-1]
    vma = getattr(jax.typeof(data), "vma", frozenset())
    out = pl.pallas_call(
        _norms_kernel,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, c, b, b), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((n_steps * c, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_steps * c, 1), jnp.float32, vma=vma),
        interpret=interpret,
    )(x)
    return out[:cap, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "chunk"))
def norms_and_keep(
    data: jax.Array,  # [cap, b, b]
    tau: jax.Array,  # f32[] threshold (on the norm, not squared)
    interpret: bool | None = None,
    chunk: int = _BLOCK_CHUNK,
):
    """(norms2 f32[cap], keep bool[cap]) fused in one HBM pass:
    keep = ||block||_F > tau."""
    cap = data.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x, n_steps, c = _pad_reshape(data, chunk)
    b = data.shape[-1]
    tau2 = jnp.square(jnp.asarray(tau, jnp.float32)).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((1, c, b, b), lambda i, t: (i, 0, 0, 0))],
        out_specs=[
            pl.BlockSpec((n_steps * c, 1), lambda i, t: (0, 0)),
            pl.BlockSpec((n_steps * c, 1), lambda i, t: (0, 0)),
        ],
    )
    n2, keep = pl.pallas_call(
        _norms_keep_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (n_steps * c, 1), jnp.float32,
                vma=getattr(jax.typeof(data), "vma", frozenset()),
            ),
            jax.ShapeDtypeStruct(
                (n_steps * c, 1), jnp.int32,
                vma=getattr(jax.typeof(data), "vma", frozenset()),
            ),
        ],
        interpret=interpret,
    )(tau2, x)
    return n2[:cap, 0], keep[:cap, 0].astype(bool)
