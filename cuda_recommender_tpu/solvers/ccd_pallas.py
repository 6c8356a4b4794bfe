"""CCD++ — Pallas-fused dense backend (opt-in).

Same math and state as the XLA dense backend (solvers/ccd_dense.py, deferred
subtract + unconditional add-back) with the rank-1 residual update fused into
the v-sweep reduction by the Pallas kernel in ops/ccd_pallas.py: 2 HBM passes
per rank (fused update+v-sweep, then the u-sweep matvecs) — the 16 B/cell/rank
algorithmic floor in principle. Measured on v5e the kernel matches XLA's own
fusion per pass (198 vs 218 GB/s) and the pallas_call boundary blocks the
cross-op fusion XLA exploits, so AUTO prefers the XLA dense backend; this
path stays as the kernel-infrastructure proof and a revisit point
(ARCHITECTURE.md roadmap #2). Validated against the NumPy golden solver like
every other backend; on CPU the kernel runs in Pallas interpreter mode so
tests exercise identical code.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.sparse import RatingMatrix, TestCOO
from ..eval.metrics import calrmse_device, default_eval_chunk
from ..ops.ccd_pallas import BM, BN, fused_update_vsweep
from .ccd_dense import DenseState, _device_densify, _half_sweep
from .pipeline import pipelined_loop
from .reference import IterStats


def make_pallas_outer_step(lam: float, maxinneriter: int, nmf: bool = False,
                           residual_dtype=jnp.float32,
                           interpret: bool = False):
    def step(state: DenseState, mask, row_nnz, col_nnz) -> DenseState:
        lam_ = jnp.float32(lam)

        def rank_body(t, carry):
            Rhat, W, H, u_sub, v_sub = carry
            u = jax.lax.dynamic_slice_in_dim(W, t, 1, axis=0)[0]
            v_add = jax.lax.dynamic_slice_in_dim(H, t, 1, axis=0)[0]
            Rhat, g, h = fused_update_vsweep(Rhat, mask, u, u_sub, v_add,
                                             v_sub, interpret=interpret)
            denom = lam_ * col_nnz + h
            v = jnp.where(denom > 0, g / denom, 0.0)
            if nmf:
                v = jnp.maximum(v, 0.0)
            u = _half_sweep(v, Rhat.T, mask.T, lam_, row_nnz, nmf)
            for _ in range(maxinneriter - 1):
                v = _half_sweep(u, Rhat, mask, lam_, col_nnz, nmf)
                u = _half_sweep(v, Rhat.T, mask.T, lam_, row_nnz, nmf)
            W = jax.lax.dynamic_update_slice_in_dim(W, u[None], t, axis=0)
            H = jax.lax.dynamic_update_slice_in_dim(H, v[None], t, axis=0)
            return (Rhat, W, H, u, v)

        k = state.W.shape[0]
        Rhat, W, H, u_pend, v_pend = jax.lax.fori_loop(
            0, k, rank_body,
            (state.Rhat, state.W, state.H, state.u_pend, state.v_pend))
        return DenseState(Rhat=Rhat, W=W, H=H, u_pend=u_pend, v_pend=v_pend)

    return jax.jit(step, donate_argnums=(0,))


def ccd_pallas_train(R: RatingMatrix, W0: np.ndarray, H0: np.ndarray,
                     T: TestCOO, cfg: Config, *,
                     callback: Optional[Callable[[IterStats], None]] = None,
                     ckpt_every: int = 0, ckpt_fn=None, resume=None,
                     ) -> tuple[np.ndarray, np.ndarray, list[IterStats]]:
    """Train CCD++ with the Pallas-fused dense backend (single chip).
    Returns (W, H, stats) in the reference's rank-major layout."""
    interpret = jax.default_backend() == "cpu"
    rdt = jnp.dtype(cfg.residual_dtype)
    m, n = R.rows, R.cols
    m_pad, n_pad = (-m) % BM, (-n) % BN
    row_nnz = np.pad(np.diff(R.csr_ptr).astype(np.float32), (0, m_pad))
    col_nnz = np.pad(np.diff(R.csc_ptr).astype(np.float32), (0, n_pad))
    mp, np_ = m + m_pad, n + n_pad

    Rd, mask = _device_densify(R, mp, np_, rdt)
    start_oiter = 1
    if resume is not None:
        start_oiter = int(resume["oiter"]) + 1
        state = DenseState(Rhat=jnp.asarray(resume["Rhat"].astype(rdt)),
                           W=jnp.asarray(resume["W"]),
                           H=jnp.asarray(resume["H"]),
                           u_pend=jnp.asarray(resume["u_pend"]),
                           v_pend=jnp.asarray(resume["v_pend"]))
    else:
        state = DenseState(
            Rhat=Rd,
            W=jnp.asarray(np.pad(np.asarray(W0, np.float32),
                                 ((0, 0), (0, m_pad)))),
            H=jnp.zeros((H0.shape[0], np_), jnp.float32),  # src/CCD.cpp:56-60
            u_pend=jnp.zeros(mp, jnp.float32),
            v_pend=jnp.zeros(np_, jnp.float32))
    row_nnz_d = jnp.asarray(row_nnz)
    col_nnz_d = jnp.asarray(col_nnz)
    ti = jnp.asarray(np.asarray(T.row_idx))
    tj = jnp.asarray(np.asarray(T.col_idx))
    tv = jnp.asarray(np.asarray(T.val))

    step_fn = make_pallas_outer_step(cfg.lambda_, cfg.maxinneriter,
                                     residual_dtype=rdt, interpret=interpret,
                                     nmf=cfg.do_nmf)
    rmse_fn = jax.jit(functools.partial(
        calrmse_device, entity_major=False,
        chunk=default_eval_chunk(T.nnz, cfg.eval_chunk)))

    box = {"state": state}

    def do_step():
        box["state"] = step_fn(box["state"], mask, row_nnz_d, col_nnz_d)
        return box["state"].W

    def do_rmse():
        s = box["state"]
        return rmse_fn(ti, tj, tv, s.W, s.H)

    def get_payload():
        s = box["state"]
        return {"W": np.asarray(s.W), "H": np.asarray(s.H),
                "Rhat": np.asarray(s.Rhat),
                "u_pend": np.asarray(s.u_pend),
                "v_pend": np.asarray(s.v_pend)}

    stats = pipelined_loop(
        start_oiter=start_oiter, maxiter=cfg.maxiter,
        fuse=cfg.fused_outer_iters, do_step=do_step, do_rmse=do_rmse,
        callback=callback, ckpt_every=ckpt_every, ckpt_fn=ckpt_fn,
        get_payload=get_payload,
        early_stop_eps=cfg.eps if cfg.early_stop else 0.0)
    state = box["state"]
    return np.asarray(state.W)[:, :m], np.asarray(state.H)[:, :n], stats
