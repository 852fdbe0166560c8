"""Host-side symbolic planning — C++ fast path with numpy fallback.

The reference's quadtree walk is host C++; the TPU design keeps a (much
smaller) host-side role: exact symbolic sizing of SpGEMM (pair and output
block counts) used to pick static capacities before tracing.  The hot
path is `libhbsm_host.so` (see `csrc/`), loaded via ctypes; a vectorized
numpy fallback keeps the library dependency-free.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SENTINEL = np.int32(np.iinfo(np.int32).max)

_LIB = None
_LIB_TRIED = False


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "csrc", "libhbsm_host.so"),
        os.path.join(os.path.dirname(here), "csrc", "libhbsm_host.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.hbsm_plan_spgemm.restype = None
                lib.hbsm_plan_spgemm.argtypes = [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int64),
                ]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def plan_spgemm_numpy(a_ids, b_ids, a_nbc, b_nbr, b_nbc):
    """Exact (n_pairs, n_out_blocks) for C = A @ B, numpy host path."""
    a_ids = np.asarray(a_ids, np.int64)
    b_ids = np.asarray(b_ids, np.int64)
    a_ids = a_ids[a_ids != _SENTINEL]
    b_ids = b_ids[b_ids != _SENTINEL]
    a_row, a_col = a_ids // a_nbc, a_ids % a_nbc
    b_row, b_col = b_ids // b_nbc, b_ids % b_nbc
    lo = np.searchsorted(b_row, a_col, side="left")
    hi = np.searchsorted(b_row, a_col, side="right")
    cnt = hi - lo
    n_pairs = int(cnt.sum())
    # Output ids: expand pairs (bounded memory: chunked expansion).
    out_ids = set()
    offs = np.concatenate([[0], np.cumsum(cnt)])
    CHUNK = 1 << 22
    for s in range(0, n_pairs, CHUNK):
        p = np.arange(s, min(s + CHUNK, n_pairs))
        e = np.searchsorted(offs, p, side="right") - 1
        t = p - offs[e]
        cid = a_row[e] * b_nbc + b_col[lo[e] + t]
        out_ids.update(np.unique(cid).tolist())
    return n_pairs, len(out_ids)


def plan_spgemm(a_ids, b_ids, a_nbc, b_nbr, b_nbc):
    lib = _load_lib()
    a_ids = np.ascontiguousarray(np.asarray(a_ids, np.int32))
    b_ids = np.ascontiguousarray(np.asarray(b_ids, np.int32))
    if lib is not None:
        out = np.zeros(2, np.int64)
        lib.hbsm_plan_spgemm(
            a_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a_ids.size,
            b_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b_ids.size,
            np.int32(a_nbc),
            np.int32(b_nbr),
            np.int32(b_nbc),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return int(out[0]), int(out[1])
    return plan_spgemm_numpy(a_ids, b_ids, a_nbc, b_nbr, b_nbc)


def have_native() -> bool:
    return _load_lib() is not None
