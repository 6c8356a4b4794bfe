"""ctypes wrapper for the native ELL bucket fill."""

from __future__ import annotations

import ctypes

import numpy as np

from . import lib

_I64 = ctypes.POINTER(ctypes.c_int64)
_I32 = ctypes.POINTER(ctypes.c_int32)
_F32 = ctypes.POINTER(ctypes.c_float)


def fill_bucket(ptr: np.ndarray, nbr_idx: np.ndarray, nbr_val: np.ndarray,
                other_slot: np.ndarray, grid: np.ndarray,
                E: int, p: int, rows_per_shard: int, L_lanes: int,
                zero_slot: int, out_idx: np.ndarray, out_val: np.ndarray
                ) -> None:
    """Fill one bucket's (rows, L) idx/val tiles (see native/src/ellfill.cpp).
    All arrays must be C-contiguous with the dtypes of data/ell.py."""
    Lh = lib()
    num_shards, slots_ps = grid.shape
    assert ptr.dtype == np.int64 and grid.dtype == np.int64
    assert nbr_idx.dtype == np.int32 and other_slot.dtype == np.int32
    assert out_idx.dtype == np.int32 and out_val.dtype == np.float32
    Lh.crtpu_ell_fill(
        ptr.ctypes.data_as(_I64),
        nbr_idx.ctypes.data_as(_I32),
        nbr_val.ctypes.data_as(_F32),
        other_slot.ctypes.data_as(_I32),
        np.ascontiguousarray(grid).ctypes.data_as(_I64),
        num_shards, slots_ps, E, p, rows_per_shard, L_lanes,
        np.int32(zero_slot),
        out_idx.ctypes.data_as(_I32),
        out_val.ctypes.data_as(_F32))
