"""Shared async-pipelined training loop.

All compiled backends drive the same host loop: enqueue ``fuse`` (step, rmse)
dispatch pairs back-to-back (device work overlaps host dispatch), then block
once per group on the tiny RMSE readbacks (~27 ms per round-trip on a
tunneled chip). Timing: the blocking readback happens BEFORE the group's
wall-clock is split across its iterations, so rank_time reflects real device
execution, not just dispatch.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from .reference import IterStats, early_stopped  # noqa: F401  (re-export)


def pipelined_loop(*, start_oiter: int, maxiter: int, fuse: int,
                   do_step: Callable[[], None],
                   do_rmse: Callable[[], object],
                   callback: Optional[Callable[[IterStats], None]] = None,
                   ckpt_every: int = 0, ckpt_fn=None,
                   get_payload: Optional[Callable[[], dict]] = None,
                   early_stop_eps: float = 0.0,
                   ) -> list[IterStats]:
    """``early_stop_eps`` > 0 ends the loop once the relative RMSE
    improvement drops below it — checked at flush boundaries, so with
    ``fuse`` > 1 up to fuse-1 extra iterations may run before the stop."""
    fuse = max(1, fuse)
    stats: list[IterStats] = []
    pending: list[tuple[int, object]] = []

    def flush(t0: float) -> float:
        if not pending:
            return t0
        # block on the readbacks FIRST so the group's device time lands in dt
        vals = [(o, float(np.asarray(r))) for o, r in pending]
        dt = (time.perf_counter() - t0) / len(pending)
        for o, v in vals:
            st = IterStats(oiter=o, rmse=v, rank_time=dt)
            stats.append(st)
            if callback:
                callback(st)
        pending.clear()
        return time.perf_counter()

    t0 = time.perf_counter()
    for oiter in range(start_oiter, maxiter + 1):
        do_step()
        pending.append((oiter, do_rmse()))
        at_ckpt = bool(ckpt_every) and oiter % ckpt_every == 0
        if len(pending) >= fuse or at_ckpt or oiter == maxiter:
            t0 = flush(t0)
            if early_stopped(stats, early_stop_eps):
                break
        if at_ckpt and ckpt_fn and get_payload is not None:
            ckpt_fn(oiter, get_payload())
    return stats
