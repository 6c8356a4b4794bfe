"""Phase-split CCD++ training loop (opt-in telemetry mode).

The default loop (pipeline.py) fuses all k ranks of an outer iteration into
one dispatch — fastest, but it cannot split the reference's per-phase timers
(rank_time = the RankOneUpdate sweeps, update_time = the UpdateRating
residual passes, src/CCD.cpp:76-139,158). This loop instead dispatches each
rank's phases separately with a device fence between them, exactly like the
reference's cudaDeviceSynchronize-per-kernel discipline
(cuda_src/CCD_CUDA.cu:339-381), trading throughput for real phase
attribution. It also carries the reference's per-rank residual-RMSE trick
(calrmse_r1, src/tools.cpp:250-270): a host-side test-residual vector gets
``-= Wt·Ht - oldWt·oldHt`` per rank, so verbose mode can print per-rank RMSE
without a full re-evaluation (the reference's commented verbose path,
src/CCD.cpp:141-148).

Schedule note: phase mode uses the reference's own plain order (add-back
from oiter 2 → sweeps → immediate subtract) rather than the fused
deferred-subtract schedule — identical math, separable phases.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from .pipeline import early_stopped
from .reference import IterStats


def phased_ccd_loop(*, start_oiter: int, maxiter: int, k: int,
                    addback: Callable[[int], object],
                    sweeps: Callable[[int], object],
                    subtract: Callable[[int], object],
                    do_rmse: Callable[[], float],
                    get_rank_rows: Optional[Callable] = None,
                    ti=None, tj=None, tv=None,
                    callback: Optional[Callable[[IterStats], None]] = None,
                    rank_callback: Optional[Callable] = None,
                    ckpt_every: int = 0, ckpt_fn=None,
                    get_payload: Optional[Callable[[], dict]] = None,
                    early_stop_eps: float = 0.0,
                    ) -> list[IterStats]:
    """Each phase thunk runs its device program for rank ``t`` AND returns a
    fence-able value (the loop calls ``jax.block_until_ready`` on it).
    ``get_rank_rows(t) -> (Wt, Ht)`` returns host copies of rank t's factor
    rows in the same index space as ``ti``/``tj`` (needed only when
    ``rank_callback`` is set)."""
    import jax

    def timed(thunk, t):
        t0 = time.perf_counter()
        jax.block_until_ready(thunk(t))
        return time.perf_counter() - t0

    resid = None
    if rank_callback is not None:
        # test residual under the CURRENT factors (handles resume; equals
        # the raw test values at a fresh start where H == 0)
        resid = np.asarray(tv, np.float64).copy()
        for t in range(k):
            Wt, Ht = get_rank_rows(t)
            resid -= Wt[ti].astype(np.float64) * Ht[tj].astype(np.float64)

    stats: list[IterStats] = []
    for oiter in range(start_oiter, maxiter + 1):
        rank_t = upd_t = 0.0
        for t in range(k):
            old = get_rank_rows(t) if rank_callback is not None else None
            if oiter > 1:                      # src/CCD.cpp:100-103
                upd_t += timed(addback, t)
            dt_sweep = timed(sweeps, t)
            rank_t += dt_sweep
            dt_sub = timed(subtract, t)
            upd_t += dt_sub
            if rank_callback is not None:
                Wt, Ht = get_rank_rows(t)
                resid -= (Wt[ti].astype(np.float64) * Ht[tj].astype(np.float64)
                          - old[0][ti].astype(np.float64)
                          * old[1][tj].astype(np.float64))
                rank_rmse = float(np.sqrt(np.mean(resid * resid)))
                rank_callback(oiter, t, dt_sweep + dt_sub, rank_rmse)
        t0 = time.perf_counter()
        rmse = float(np.asarray(do_rmse()))
        st = IterStats(oiter=oiter, rmse=rmse, rank_time=rank_t,
                       update_time=upd_t,
                       rmse_time=time.perf_counter() - t0)
        stats.append(st)
        if callback:
            callback(st)
        if ckpt_every and ckpt_fn and get_payload is not None \
                and oiter % ckpt_every == 0:
            ckpt_fn(oiter, get_payload())
        if early_stopped(stats, early_stop_eps):
            break
    return stats
