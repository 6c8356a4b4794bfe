"""CCD++ ELL backend, sharded over a 1-D device mesh with shard_map.

Decomposition (new design — the reference has no multi-device story,
SURVEY.md §2): both ELL orientations are built with ``num_shards = N`` so
every bucket's physical rows are dealt round-robin across devices
(degree-balanced) and padded shard-uniform; global slot order is shard-major,
so each device's factor slots are one contiguous block and
``jax.lax.all_gather(..., tiled=True)`` reassembles the global table as a
plain concat. Per rank sweep:

  * the swept side's updates are local to each shard (its slot block);
  * the opposite-side vector is all-gathered over ICI (the only communication,
    2-3 gathers of (n_slots,) floats per rank);
  * residual bucket tiles are updated locally — never communicated.

The per-shard kernel body is byte-identical math to the single-device solver
(solvers/ccd_ell.py), reusing ops/ell_ops on each side's ``local_view()``.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import Config
from ..data.ell import EllPair, build_ell_pair
from ..data.sparse import RatingMatrix, TestCOO
from ..eval.metrics import calrmse_device, default_eval_chunk
from ..ops.ell_ops import extend_zero, residual_update, sweep_new_values
from ..solvers.pipeline import early_stopped
from ..solvers.reference import IterStats
from .mesh import AXIS, ell_shardings


def make_sharded_ell_step(ell: EllPair, mesh: Mesh, lam: float,
                          maxinneriter: int, axis: str = AXIS,
                          nmf: bool = False):
    rows, cols = ell.rows_side.local_view(), ell.cols_side.local_view()
    lam_ = jnp.float32(lam)

    def gather_full(x_loc):
        """Local slot block -> global slot table (+ trailing zero slot)."""
        return extend_zero(jax.lax.all_gather(x_loc, axis, axis=0, tiled=True))

    def step_local(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c,
                   u_pend, v_pend):
        def rank_body(t, carry):
            vals_r, vals_c, W, H, u_pend, v_pend = carry
            u_old = jax.lax.dynamic_slice_in_dim(W, t, 1, 0)[0]   # local slots
            v_old = jax.lax.dynamic_slice_in_dim(H, t, 1, 0)[0]
            u, v = u_old, v_old
            for i in range(maxinneriter):
                if i == 0:
                    # deferred cols-side subtract of the previous rank +
                    # unconditional add-back + sweep, off ONE stacked
                    # all_gather of [u_pend, u_old] (solvers/ccd_ell.py)
                    stacked_c = extend_zero(jax.lax.all_gather(
                        jnp.stack([u_pend, u_old], axis=-1), axis, axis=0,
                        tiled=True))
                    Gc = [stacked_c[ix] for ix in idx_c]
                    vals_c = residual_update(idx_c, vals_c, cols, None, v_pend,
                                             -1.0, gathered=[g[..., 0] for g in Gc])
                    vals_c = residual_update(idx_c, vals_c, cols, None, v_old,
                                             +1.0, gathered=[g[..., 1] for g in Gc])
                    v, _ = sweep_new_values(idx_c, vals_c, cols, None, lam_,
                                            nnz_c, gathered=[g[..., 1] for g in Gc], nmf=nmf)
                else:
                    v, _ = sweep_new_values(idx_c, vals_c, cols,
                                            gather_full(u), lam_, nnz_c,
                                            nmf=nmf)
                if i == 0:
                    stacked = extend_zero(jax.lax.all_gather(
                        jnp.stack([v_old, v], axis=-1), axis, axis=0, tiled=True))
                    G = [stacked[ix] for ix in idx_r]
                    vals_r = residual_update(idx_r, vals_r, rows, None, u_old,
                                             +1.0, gathered=[g[..., 0] for g in G])
                    u, vg = sweep_new_values(idx_r, vals_r, rows, None, lam_,
                                             nnz_r, gathered=[g[..., 1] for g in G], nmf=nmf)
                else:
                    u, vg = sweep_new_values(idx_r, vals_r, rows,
                                             gather_full(v), lam_, nnz_r,
                                             nmf=nmf)
            W = jax.lax.dynamic_update_slice_in_dim(W, u[None], t, 0)
            H = jax.lax.dynamic_update_slice_in_dim(H, v[None], t, 0)
            vals_r = residual_update(idx_r, vals_r, rows, None, u, -1.0,
                                     gathered=vg)
            return (vals_r, vals_c, W, H, u, v)

        k = W.shape[0]
        return jax.lax.fori_loop(
            0, k, rank_body, (vals_r, vals_c, W, H, u_pend, v_pend))

    nb_r = len(rows.buckets)
    nb_c = len(cols.buckets)
    bspec = P(axis, None)
    in_specs = (tuple([bspec] * nb_r), tuple([bspec] * nb_c),
                tuple([bspec] * nb_r), tuple([bspec] * nb_c),
                P(None, axis), P(None, axis), P(axis), P(axis),
                P(axis), P(axis))
    out_specs = (tuple([bspec] * nb_r), tuple([bspec] * nb_c),
                 P(None, axis), P(None, axis), P(axis), P(axis))
    fn = jax.shard_map(step_local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn, donate_argnums=(2, 3, 4, 5, 8, 9))


def ccd_ell_train_sharded(R: RatingMatrix, W0: np.ndarray, H0: np.ndarray,
                          T: TestCOO, cfg: Config, mesh: Mesh, *,
                          callback: Optional[Callable[[IterStats], None]] = None,
                          ckpt_every: int = 0, ckpt_fn=None, resume=None,
                          ) -> tuple[np.ndarray, np.ndarray, list[IterStats]]:
    """Multi-device CCD++ training. Factors/stats returned in reference
    rank-major entity order; numerically equivalent to the single-device ELL
    backend (validated by tests/test_sharded.py on an 8-device CPU mesh)."""
    n_dev = mesh.devices.size
    ell = build_ell_pair(R, min_width=cfg.ell_min_width, num_shards=n_dev)
    rows, cols = ell.rows_side, ell.cols_side
    sh = ell_shardings(mesh)

    put_b = functools.partial(jax.device_put, device=sh["bucket"])
    idx_r = tuple(put_b(b.idx) for b in rows.buckets)
    idx_c = tuple(put_b(b.idx) for b in cols.buckets)
    vals_r = tuple(put_b(b.val) for b in rows.buckets)
    vals_c = tuple(put_b(b.val) for b in cols.buckets)

    start_oiter = 1
    if resume is not None:
        start_oiter = int(resume["oiter"]) + 1
        W = jax.device_put(resume["W"], sh["factors_rank_major"])
        H = jax.device_put(resume["H"], sh["factors_rank_major"])
        u_pend = jax.device_put(resume["u_pend"], sh["slots"])
        v_pend = jax.device_put(resume["v_pend"], sh["slots"])
        vals_r = tuple(put_b(resume[f"vals_r_{i}"])
                       for i in range(len(rows.buckets)))
        vals_c = tuple(put_b(resume[f"vals_c_{i}"])
                       for i in range(len(cols.buckets)))
    else:
        W_s = np.zeros((W0.shape[0], rows.n_slots), np.float32)
        W_s[:, rows.slot_of_entity] = np.asarray(W0, np.float32)
        W = jax.device_put(W_s, sh["factors_rank_major"])
        H = jax.device_put(np.zeros((H0.shape[0], cols.n_slots), np.float32),
                           sh["factors_rank_major"])      # src/CCD.cpp:56-60
        u_pend = jax.device_put(np.zeros(rows.n_slots, np.float32), sh["slots"])
        v_pend = jax.device_put(np.zeros(cols.n_slots, np.float32), sh["slots"])
    nnz_r = jax.device_put(rows.slot_nnz, sh["slots"])
    nnz_c = jax.device_put(cols.slot_nnz, sh["slots"])

    rep = sh["rep"]
    ti = jax.device_put(rows.slot_of_entity[T.row_idx], rep)
    tj = jax.device_put(cols.slot_of_entity[T.col_idx], rep)
    tv = jax.device_put(np.asarray(T.val), rep)

    step = make_sharded_ell_step(ell, mesh, cfg.lambda_,
                                 cfg.maxinneriter, nmf=cfg.do_nmf)
    rmse_fn = jax.jit(functools.partial(
        calrmse_device, entity_major=False,
        chunk=default_eval_chunk(T.nnz, cfg.eval_chunk)))

    stats: list[IterStats] = []
    for oiter in range(start_oiter, cfg.maxiter + 1):
        t0 = time.perf_counter()
        vals_r, vals_c, W, H, u_pend, v_pend = step(
            idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c, u_pend, v_pend)
        rmse = float(np.asarray(rmse_fn(ti, tj, tv, W, H)))
        st = IterStats(oiter=oiter, rmse=rmse,
                       rank_time=time.perf_counter() - t0)
        stats.append(st)
        if callback:
            callback(st)
        if ckpt_every and ckpt_fn and oiter % ckpt_every == 0:
            payload = {"W": np.asarray(W), "H": np.asarray(H),
                       "u_pend": np.asarray(u_pend),
                       "v_pend": np.asarray(v_pend)}
            for i, v_ in enumerate(vals_r):
                payload[f"vals_r_{i}"] = np.asarray(v_)
            for i, v_ in enumerate(vals_c):
                payload[f"vals_c_{i}"] = np.asarray(v_)
            ckpt_fn(oiter, payload)
        if early_stopped(stats, cfg.eps if cfg.early_stop else 0.0):
            break

    W_ent = np.asarray(W)[:, rows.slot_of_entity]
    H_ent = np.asarray(H)[:, cols.slot_of_entity]
    return W_ent, H_ent, stats
