"""Device primitives over the degree-bucketed padded-ELL layout (data/ell.py).

These are the TPU replacements for the reference's CSC-segment walks
(/root/reference/src/CCD.cpp:6-43, cuda_src/CCD_CUDA.cu:3-58): every operation
is a fixed-shape gather / elementwise / lane-reduction over (rows, L) bucket
tiles, with padding neutralized by the zero-slot trick (padded idx entries
point one past the other side's slot table, where an appended 0 lives) — no
masks, no scatters, no dynamic shapes.

Bucket lane geometry: a bucket stores ``p`` slots per physical row, each in a
contiguous E-lane span, L = p*E (ell.py). ``lanes_to_slots`` reduces a
(rows, L) tile to per-slot sums; ``slots_to_lanes`` broadcasts per-slot values
back across their lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.ell import EllBucket, EllSide


def extend_zero(table: jnp.ndarray) -> jnp.ndarray:
    """Append the zero slot (index n_slots) along axis 0."""
    if table.ndim == 1:
        return jnp.concatenate([table, jnp.zeros((1,), table.dtype)])
    return jnp.concatenate(
        [table, jnp.zeros((1,) + table.shape[1:], table.dtype)], axis=0)


def lanes_to_slots(lanes: jnp.ndarray, b: EllBucket) -> jnp.ndarray:
    """(rows, L) -> per-slot sums (rows*p,), slot-ordered."""
    rows = lanes.shape[0]
    return lanes.reshape(rows * b.p, b.E).sum(axis=1)


def slots_to_lanes(slot_vals: jnp.ndarray, b: EllBucket) -> jnp.ndarray:
    """Per-slot values (rows*p,) -> (rows, L) with each slot's value broadcast
    across its E lanes."""
    rows = slot_vals.shape[0] // b.p
    return jnp.broadcast_to(
        slot_vals.reshape(rows, b.p, 1), (rows, b.p, b.E)).reshape(rows, b.p * b.E)


def bucket_slot_ranges(side: EllSide) -> list[tuple[int, int]]:
    """Global slot [start, stop) of each bucket (single-shard layout, where
    bucket slots are contiguous; the sharded path slices per-shard instead)."""
    assert side.num_shards == 1, "global contiguous ranges need num_shards=1"
    out = []
    for off, b in zip(side.bucket_offsets, side.buckets):
        out.append((off, off + b.slots_per_shard))
    return out


def sweep_new_values(idx_tiles, val_tiles, side: EllSide, other_ext: jnp.ndarray,
                     lam: jnp.ndarray, slot_nnz: jnp.ndarray,
                     gathered=None,
                     nmf: bool = False) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """One CCD half-sweep over a side: for every slot j,
    new_j = g_j / (lam*nnz_j + h_j), g = Σ other[idx]*val, h = Σ other[idx]²
    (RankOneUpdate, src/CCD.cpp:6-16; λ nnz-scaled by the caller passing
    lam*slot_nnz implicitly via slot_nnz here). Empty slot -> 0 (src/CCD.cpp:8).
    ``nmf`` clamps updates at 0 (libpmf -N semantics; dead flag in the
    reference, src/pmf.h:33).

    Returns (new_slot_values (n_slots,), per-bucket gathered other tiles for
    reuse by a following residual update with the same vector).
    """
    outs = []
    gathers = []
    for i, b in enumerate(side.buckets):
        og = other_ext[idx_tiles[i]] if gathered is None else gathered[i]
        gathers.append(og)
        g = lanes_to_slots(og * val_tiles[i], b)
        h = lanes_to_slots(og * og, b)
        outs.append(g / (lam * _bslice(slot_nnz, side, i) + h))
    tail = side.n_slots - (side.bucket_offsets[-1] + side.buckets[-1].slots_per_shard
                           if side.buckets else 0)
    if not side.buckets:
        return jnp.zeros(side.n_slots, jnp.float32), gathers
    new_vals = jnp.concatenate(outs + ([jnp.zeros(tail, outs[0].dtype)] if tail else []))
    new_vals = jnp.where(slot_nnz > 0, new_vals, 0.0)
    return (jnp.maximum(new_vals, 0.0) if nmf else new_vals), gathers


def paired_gather(pair_ext: jnp.ndarray, idx_tiles) -> list:
    """Gather a 2-wide table (S+1, 2) at bucket index tiles in ROW-gather
    mode with bounded padded temps.

    Two measured TPU facts collide here (ARCHITECTURE.md): 1-wide gathers
    from a flat (S,) table run in scalar mode (~7.7 ns/element) while 2-wide
    gathers from an (S, 2) table run in row mode (~3.3 ns/ROW — both values
    arrive for the price of one); but a materialized (rows, L, 2) gather
    output pads its minor dim 2 -> 128 lanes, a ~31x HLO-temp expansion
    (7.6 GB at Netflix dims). Chunking the rows under lax.map keeps exactly
    one chunk's padded buffer live while every gather still issues in row
    mode. Padding chunks index the table's last row — the appended zero row
    (extend_zero), so they gather exact zeros.

    Returns per-bucket (first, second) (rows, L) arrays.
    """
    zero_row = pair_ext.shape[0] - 1
    out = []
    for ix in idx_tiles:
        rows, L = ix.shape
        chunk = max(8, (1 << 19) // max(1, L))   # padded temp ~256 MB cap
        pad = (-rows) % chunk
        ixp = (jnp.concatenate(
            [ix, jnp.full((pad, L), zero_row, ix.dtype)]) if pad else ix)

        def body(ic):
            g = pair_ext[ic]                     # (chunk, L, 2) bounded temp
            return g[..., 0], g[..., 1]

        a, b = jax.lax.map(body, ixp.reshape(-1, chunk, L))
        out.append((a.reshape(-1, L)[:rows], b.reshape(-1, L)[:rows]))
    return out


def sweep_partials(idx_tiles, val_tiles, side: EllSide, other_ext,
                   gathered=None) -> tuple[jnp.ndarray, jnp.ndarray, list]:
    """Per-slot sweep partial sums WITHOUT the division: g = Σ other[idx]*val,
    h = Σ other[idx]² as full slot vectors (zero tail for non-bucket slots).

    Used by the hybrid backend (solvers/ccd_hybrid.py), which combines these
    with the dense sub-block's matvec partials before forming
    new_j = (g_ell + g_dense) / (λ·nnz_total + h_ell + h_dense) — the same
    RankOneUpdate math (src/CCD.cpp:6-16) with the Ω_j sum split by part.
    Returns (g, h, per-bucket gathered tiles for reuse)."""
    if not side.buckets:
        z = jnp.zeros(side.n_slots, jnp.float32)
        return z, z, []
    gs, hs, gathers = [], [], []
    for i, b in enumerate(side.buckets):
        og = other_ext[idx_tiles[i]] if gathered is None else gathered[i]
        gathers.append(og)
        gs.append(lanes_to_slots(og * val_tiles[i], b))
        hs.append(lanes_to_slots(og * og, b))
    tail = side.n_slots - (side.bucket_offsets[-1]
                           + side.buckets[-1].slots_per_shard)
    ztail = [jnp.zeros(tail, jnp.float32)] if tail else []
    return (jnp.concatenate(gs + ztail), jnp.concatenate(hs + ztail), gathers)


def residual_update(idx_tiles, val_tiles, side: EllSide, other_ext: jnp.ndarray,
                    own_slots: jnp.ndarray, sign: float,
                    gathered=None) -> tuple[jnp.ndarray, ...]:
    """Residual maintenance (UpdateRating, src/CCD.cpp:18-43):
    val[j, e] += sign * other[idx[j, e]] * own[j], per bucket tile. Padded
    lanes gather 0 so they stay exactly 0. Reuses ``gathered`` tiles when the
    caller just gathered the same vector (sweep-then-subtract fusion)."""
    out = []
    s = jnp.float32(sign)
    for i, b in enumerate(side.buckets):
        og = other_ext[idx_tiles[i]] if gathered is None else gathered[i]
        ob = slots_to_lanes(_bslice(own_slots, side, i), b)
        out.append(val_tiles[i] + s * og * ob)
    return tuple(out)


def _bslice(slot_vec: jnp.ndarray, side: EllSide, i: int) -> jnp.ndarray:
    """Slice a per-slot vector down to bucket i's slots (single-shard layout)."""
    off = side.bucket_offsets[i]
    return slot_vec[off:off + side.buckets[i].slots_per_shard]
