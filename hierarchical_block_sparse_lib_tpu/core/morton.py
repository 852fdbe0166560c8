"""Morton (Z-order) codes: the pointer-free quadtree.

The reference's quadtree (SURVEY.md C2: ``children[4]``, lazy allocation)
is replaced by bit arithmetic: a quadtree node at level ``l`` (root =
level 0) over a ``2^d x 2^d`` block grid is the set of blocks whose
Morton code shares its top ``2*l`` bits.  Subtree aggregation = segment
reduction keyed on ``morton >> (2*(d-l))``.
"""

from __future__ import annotations

import jax.numpy as jnp


def interleave_bits(x: jnp.ndarray, bits: int = 16) -> jnp.ndarray:
    """Spread the low `bits` bits of x so consecutive bits land 2 apart.

    Classic magic-number bit spreading, vectorized; int32 in/out
    (uses uint32 internally; supports bits <= 16).
    """
    v = x.astype(jnp.uint32)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v.astype(jnp.int32)


def encode(brow: jnp.ndarray, bcol: jnp.ndarray) -> jnp.ndarray:
    """Morton code with row bits in odd positions, col bits in even."""
    return (interleave_bits(brow) << 1) | interleave_bits(bcol)


def deinterleave_bits(v: jnp.ndarray) -> jnp.ndarray:
    v = v.astype(jnp.uint32) & jnp.uint32(0x55555555)
    v = (v | (v >> 1)) & jnp.uint32(0x33333333)
    v = (v | (v >> 2)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v >> 4)) & jnp.uint32(0x00FF00FF)
    v = (v | (v >> 8)) & jnp.uint32(0x0000FFFF)
    return v.astype(jnp.int32)


def decode(code: jnp.ndarray):
    """Inverse of `encode`: returns (brow, bcol)."""
    return deinterleave_bits(code >> 1), deinterleave_bits(code)


def subtree_key(code: jnp.ndarray, depth: int, level: int) -> jnp.ndarray:
    """Quadtree-node key at `level` for blocks of a depth-`depth` tree.

    depth = ceil(log2(nb)) — leaf level.  level 0 = root (key 0 for all),
    level == depth = one key per block.
    """
    shift = 2 * (depth - level)
    return code >> shift
