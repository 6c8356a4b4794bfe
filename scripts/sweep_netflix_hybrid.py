"""Flagship sweep grid (VERDICT r3 next #4 + the auto-stair A/B of #2).

Hybrid backend at Netflix-100M dims over k x panel budget x stair choice,
>= 2 repeats per config, group-difference timing — the way the reference's
harness exercises its flagship kernel (/root/reference/scripts/times.sh:5-38:
k x T x 3 repeats per dataset). One JSONL row per (config, repeat);
redirect to results/sweep_netflix_hybrid_r4.jsonl.

The (auto vs hand-widths) pairs at equal budget are the committed
auto-stair A/B: whichever wins at the headline config becomes the
bench.py / Config default (VERDICT r3 weak #2).

Usage: python scripts/sweep_netflix_hybrid.py [quick]
       quick = first 2 configs only (smoke).
CRTPU_BENCH_CPU=1 shrinks dims for a CPU flow check.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if os.environ.get("CRTPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.eval.metrics import calrmse_np        # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import (          # noqa: E402
    densify_panels, make_hybrid_outer_step, plan_hybrid)

CPU = bool(os.environ.get("CRTPU_BENCH_CPU"))
# r5: defer default 0 — the headline runs undeferred since the tail floor
# proof (results/tail_floor_r4.json); the r4 grid ran with DEFER=8
DEFER = int(os.environ.get("CRTPU_DEFER_GROUP", "0"))

# grid rows: (k, budget_tag, widths, inner_iters)
if CPU:
    M, N, NNZ = 6_040, 3_706, 900_000
    BUDGETS = {"small": 2_000 * 3_706}
    GRID = [(8, "small", (256,), 1), (8, "small", "auto", 1)]
else:
    M, N, NNZ = 480_189, 17_770, 100_000_000
    BUDGETS = {"2.0e9": 2_000_000_000, "4.2e9": 4_200_000_000,
               "6.5e9": 6_500_000_000}
    HAND = (4096, 2048)
    GRID = [
        # rows 0-10: the r4 grid (k x budget x stair)
        (10, "2.0e9", HAND, 1), (10, "4.2e9", HAND, 1),
        (10, "6.5e9", HAND, 1),
        (40, "2.0e9", HAND, 1), (40, "4.2e9", HAND, 1),
        (40, "6.5e9", HAND, 1),
        (40, "2.0e9", "auto", 1), (40, "4.2e9", "auto", 1),
        (40, "6.5e9", "auto", 1),
        (100, "6.5e9", HAND, 1), (100, "6.5e9", "auto", 1),
        # rows 11-14: the r5 k-axis extension at the headline budget
        # (VERDICT r4 next #5 — times.sh:5-38's k axis on the backend that
        # matters) plus the T=7 inner-iteration row
        (5, "6.5e9", HAND, 1), (20, "6.5e9", HAND, 1),
        (50, "6.5e9", HAND, 1), (40, "6.5e9", HAND, 7),
    ]
LAM = 0.05
REPEATS = 2
GROUP = 4 if not CPU else 2
# r5: 3 pairs (r4's PAIRS=2 made the group-difference median the mean of
# two numbers — fragile exactly when the tunnel misbehaves, VERDICT weak #4)
PAIRS = 3


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "quick":
        grid = GRID[:2]
    elif len(sys.argv) > 1 and sys.argv[1].startswith("rows="):
        want = {int(x) for x in sys.argv[1][5:].split(",")}
        grid = [g for i, g in enumerate(GRID) if i in want]
    else:
        grid = GRID
    R, T = synthetic_cached(M, N, NNZ, seed=1, test_fraction=0.02)
    kernel = not CPU

    plans = {}   # (budget_tag, widths) -> (plan, plan_s)

    for k, btag, widths, inner in grid:
        key = (btag, widths)
        if key not in plans:
            cfg = Config(k=40, lambda_=LAM, backend="hybrid",
                         residual_dtype="bfloat16", mask_dtype="nan",
                         hybrid_dense_cells=BUDGETS[btag],
                         hybrid_panel_widths=widths)
            t0 = time.perf_counter()
            plans[key] = (plan_hybrid(R, cfg, materialize_dense=False),
                          time.perf_counter() - t0)
        plan, plan_s = plans[key]
        rows, cols = plan.ell.rows_side, plan.ell.cols_side
        masks = ()
        idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
        idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
        consts = (jnp.asarray(plan.row_nnz), jnp.asarray(plan.col_nnz),
                  jnp.asarray(plan.upos_of_slot_safe),
                  jnp.asarray(plan.ipos_of_slot_safe),
                  jnp.asarray(plan.slot_of_upos),
                  jnp.asarray(plan.slot_of_ipos))
        step = make_hybrid_outer_step(plan, LAM, inner,
                                      residual_dtype=jnp.bfloat16,
                                      nan_mask=True, panel_kernel=kernel,
                                      defer_group=DEFER)

        def run(s):
            return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                        s[5], s[6], *consts)

        W0, _ = init_factors_np(k, M, N, seed=0)
        s = None
        for rep in range(REPEATS):
            del s                  # free the previous repeat's ~8-13 GB of
            s = None               # panels BEFORE densifying fresh ones
            s = (densify_panels(plan, jnp.bfloat16, mask_dtype="nan",
                                block_pad=kernel)[0],
                 tuple(jnp.asarray(b.val) for b in rows.buckets),
                 tuple(jnp.asarray(b.val) for b in cols.buckets),
                 jnp.asarray(W0[:, plan.user_order]),
                 jnp.zeros((k, N), jnp.float32),
                 jnp.zeros(M, jnp.float32), jnp.zeros(N, jnp.float32))
            t0 = time.perf_counter()
            s = run(s)
            _ = np.asarray(s[3]).sum()
            compile_s = time.perf_counter() - t0

            def grp(g, s):
                t0 = time.perf_counter()
                for _ in range(g):
                    s = run(s)
                _ = np.asarray(s[3]).sum()
                return time.perf_counter() - t0, s

            t1s, tgs = [], []
            for _ in range(PAIRS):
                d1, s = grp(1, s)
                dg, s = grp(GROUP, s)
                t1s.append(d1)
                tgs.append(dg)
            dt = ((float(np.median(tgs)) - float(np.median(t1s)))
                  / (GROUP - 1))
            pair_samples = [(g - o) / (GROUP - 1)
                            for g, o in zip(tgs, t1s)]
            spread_pct = (100.0 * (max(pair_samples) - min(pair_samples))
                          / dt if dt else 0.0)
            W_ent = np.asarray(s[3])[:, plan.user_pos]
            H_ent = np.asarray(s[4])[:, plan.item_pos]
            rmse = calrmse_np(T, W_ent, H_ent, entity_major=False)
            rec = {
                "dataset": f"netflix-dims synthetic zipf ({M}x{N}, "
                           f"nnz={R.nnz})",
                "solver": "ccd", "backend": "hybrid",
                "k": k, "inner": inner, "lambda": LAM,
                "budget_cells": BUDGETS[btag],
                "widths": ("auto" if widths == "auto" else list(widths)),
                "panels": [list(p) for p in plan.panels],
                "nnz_light_frac": round(plan.nnz_light / R.nnz, 4),
                "defer_group": DEFER,
                "repeat": rep,
                "plan_s": round(plan_s, 1),
                "compile_s": round(compile_s, 1),
                "iter_s": round(dt, 3),
                "iter_s_pair_samples": [round(x, 3) for x in pair_samples],
                "iter_s_spread_pct": round(spread_pct, 1),
                "rating_updates_per_s_M": round(R.nnz * k / dt / 1e6, 1),
                "rmse_after_iters": round(rmse, 4),
                "panel_kernel": kernel, "residual_dtype": "bfloat16",
                "mask_dtype": "nan",
                "device": jax.default_backend(), "date": "2026-08",
            }
            print(json.dumps(rec), flush=True)
        del s


if __name__ == "__main__":
    main()
