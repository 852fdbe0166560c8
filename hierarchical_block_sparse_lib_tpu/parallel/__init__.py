"""Distributed execution over device meshes.

- `dist`: 1D block-row partition, ring-SUMMA SpGEMM (B shards rotate via
  ppermute, overlapped with leaf GEMMs); the simplest scalable layout.
- `dist2d`: square 2D mesh, Cannon's algorithm (both operands resident,
  nearest-neighbor rotations on the ICI torus) — the 2D block partition
  of SURVEY.md section 8.3.
"""

from hierarchical_block_sparse_lib_tpu.parallel import dist, dist2d

__all__ = ["dist", "dist2d"]
