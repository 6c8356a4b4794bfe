"""Yahoo-shaped robustness runs (VERDICT r2 missing #2): the reference sweep
grid covers yahoor1 (~1.9M x 98k) and yahooc15 (~1M x 625k)
(/root/reference/scripts/times.sh:29-38) — aspect ratios qualitatively
unlike MovieLens/Netflix. Every round-2 artifact was ml/netflix-shaped, so
the hybrid planner's corner-cover assumption and the auto stair had never
seen a huge item axis (c15: the full-width panel can afford only ~10k user
rows at the Netflix budget) or a 1.9M-user axis (r1: slot tables and remap
gathers 4x the Netflix ones).

Per dataset: plan (auto stair) -> train 1+GROUP iterations of the hybrid
backend on TPU with group-difference timing -> RMSE after the timed iters.
ALS additionally at yahoor1 dims (k=40). Emits one JSON line per run;
redirect to results/yahoo_robustness_r3.json.

Usage: python scripts/yahoo_robustness.py [r1|c15|als_r1|all]
CRTPU_BENCH_CPU=1 shrinks dims ~1000x for a CPU flow check.
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

CPU = bool(os.environ.get("CRTPU_BENCH_CPU"))

#                 m        n       nnz    budget_cells
SPECS = {
    "r1": (1_948_883, 98_211, 115_000_000, 6_000_000_000),
    "c15": (1_000_990, 624_961, 100_000_000, 6_000_000_000),
}
if CPU:
    SPECS = {"r1": (1_900, 98, 115_000, 60_000),
             "c15": (1_000, 625, 100_000, 60_000)}


def run_hybrid(tag: str, transpose: bool = False) -> dict:
    m, n, nnz, budget = SPECS[tag]
    k, lam = 40 if not CPU else 8, 0.05
    R, T = synthetic_cached(m, n, nnz, seed=11, test_fraction=0.02)
    if transpose:
        # r5 transposed-stair A/B (VERDICT r4 next #4): plan panels over
        # top-ITEMS x user prefixes by solving the transposed problem —
        # same timing discipline, orientation flipped
        from cuda_recommender_tpu.data.sparse import make_test
        R = R.transpose()
        m, n = n, m
        T = make_test(T.cols, T.rows, T.col_idx, T.row_idx, T.val)

    from cuda_recommender_tpu.solvers.ccd_hybrid import (
        densify_panels, make_hybrid_outer_step, plan_hybrid)
    cfg = Config(k=k, lambda_=lam, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=budget, hybrid_panel_widths="auto")
    t0 = time.perf_counter()
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    plan_s = time.perf_counter() - t0
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    kernel = not CPU
    Rds, masks = densify_panels(plan, jnp.bfloat16, mask_dtype="nan",
                                block_pad=kernel)

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, _ = init_factors_np(k, m, n, seed=0)
    s = (Rds, vals_r, vals_c, jnp.asarray(W0[:, plan.user_order]),
         jnp.zeros((k, n), jnp.float32),
         jnp.zeros(m, jnp.float32), jnp.zeros(n, jnp.float32))
    consts = (jnp.asarray(plan.row_nnz), jnp.asarray(plan.col_nnz),
              jnp.asarray(plan.upos_of_slot_safe),
              jnp.asarray(plan.ipos_of_slot_safe),
              jnp.asarray(plan.slot_of_upos), jnp.asarray(plan.slot_of_ipos))
    step = make_hybrid_outer_step(plan, lam, 1, residual_dtype=jnp.bfloat16,
                                  nan_mask=True, panel_kernel=kernel)

    def run(s):
        return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                    s[5], s[6], *consts)

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

    # G=6 x 3 rounds: at these scales an iteration is 5-20 s while the
    # fence readback varies by multiple seconds — the first cut (G=4 x 2)
    # measured a NEGATIVE c15 difference when one 1-group fence spiked
    G = 6 if not CPU else 2
    t1s, tgs = [], []
    for _ in range(3 if not CPU else 2):
        d1, s = grp(1, s)
        dg, s = grp(G, s)
        t1s.append(d1)
        tgs.append(dg)
    dt = (float(np.median(tgs)) - float(np.median(t1s))) / (G - 1)

    W_ent = np.asarray(s[3])[:, plan.user_pos]
    H_ent = np.asarray(s[4])[:, plan.item_pos]
    rmse = calrmse_np(T, W_ent, H_ent, entity_major=False)
    panel_cells = sum((r1_ - r0) * w for r0, r1_, w in plan.panels)
    # measured-floor attribution (results/tail_floor_r4.json): panels at
    # the 3-pass kernel HBM cost, tail at the measured pure-sweep gather
    # wall 3.9 ns/padded-lane
    lanes = (sum(b.idx.size for b in rows.buckets)
             + sum(b.idx.size for b in cols.buckets))
    floor_iter = k * (panel_cells * 6 / 819e9 + lanes * 3.9e-9)
    # achievable composite floor (r5): padded panel cells at the measured
    # 678 GB/s kernel RMW rate + tail at the 6.5 ns/lane maintenance wall
    from cuda_recommender_tpu.ops.panel_pallas import padded_panel_shape
    padded_cells = sum(int(np.prod(padded_panel_shape(r1_ - r0, w)))
                      for r0, r1_, w in plan.panels) if kernel else panel_cells
    achv_iter = k * (padded_cells * 6 / 678e9 + lanes * 6.5e-9)
    return {
        "workload": f"hybrid CCD++ yahoo{tag}-dims synthetic zipf "
                    f"({m}x{n}, nnz={R.nnz}), k={k}, bf16+nan"
                    + (", panel kernels" if kernel else "")
                    + (", TRANSPOSED stair (top-items x user prefixes)"
                       if transpose else ""),
        "transposed_stair": transpose,
        "panels": [list(p) for p in plan.panels],
        "n_panels": len(plan.panels),
        "panel_cells": int(panel_cells),
        "nnz_light_frac": round(plan.nnz_light / R.nnz, 4),
        "plan_s": round(plan_s, 1),
        "compile_s": round(compile_s, 1),
        "iter_s": round(dt, 3),
        "t1_group_samples_s": [round(x, 2) for x in t1s],
        "tG_group_samples_s": [round(x, 2) for x in tgs],
        "updates_per_s_M": round(R.nnz * k / dt / 1e6, 1),
        "lanes_padded": int(lanes),
        "floor_iter_s": round(floor_iter, 3),
        "frac_of_floor": round(floor_iter / dt, 3) if dt > 0 else None,
        "floor_def": "panels 6 B/cell/rank @ 819 GB/s + tail @ measured "
                     "3.9 ns/padded-lane pure-sweep wall "
                     "(results/tail_floor_r4.json)",
        "achievable_floor_iter_s": round(achv_iter, 3),
        "frac_of_achievable": (round(achv_iter / dt, 3) if dt > 0
                               else None),
        "achievable_def": "PADDED panel cells @ measured 678 GB/s kernel "
                          "RMW rate (results/panel_floor_r5.json) + tail "
                          "@ 6.5 ns/lane maintenance wall",
        "rmse_after_iters": round(rmse, 4),
        "device": jax.default_backend(),
    }


def run_als(tag: str = "r1") -> dict:
    # r5: generalized beyond r1 — als_c15 closes the last unmeasured cell of
    # the reference's six-geometry x two-solver grid
    # (/root/reference/scripts/times.sh:41-66 sweeps ALS on yahooc15 too).
    # At c15 dims BOTH factor tables (1.0M and 625k entities x k=40 f32 =
    # 160 / 100 MB) exceed the ~32-64 MB gather cliff
    # (results/als_gather_cliff_r5.json), so both sides gather tiled.
    m, n, nnz, _ = SPECS[tag]
    k, lam = 40 if not CPU else 8, 0.05
    R, T = synthetic_cached(m, n, nnz, seed=11, test_fraction=0.02)
    from cuda_recommender_tpu.data.ell import build_ell_pair
    from cuda_recommender_tpu.solvers.als_ell import make_als_outer_step
    # r5: als_min_width defaults to "auto" — the degree-adaptive floor the
    # r4 artifact asked for (avg user degree 59 vs the old fixed 128);
    # als_group_mb override via env for headroom experiments
    cfg = Config(solver="als", k=k, lambda_=lam,
                 als_group_mb=int(os.environ.get("CRTPU_ALS_GROUP_MB",
                                                 "2048")),
                 als_gather_tile_mb=float(
                     os.environ.get("CRTPU_ALS_TILE_MB", "32")))
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    rows, cols = ell.rows_side, ell.cols_side
    # gather-cliff tiling (r5): same wire-up as als_ell_train
    from cuda_recommender_tpu.solvers.als_ell import build_side_gather_tiles
    tb_r, ta_r = build_side_gather_tiles(rows, cols.n_slots, k,
                                         cfg.als_gather_tile_mb)
    tb_c, ta_c = build_side_gather_tiles(cols, rows.n_slots, k,
                                         cfg.als_gather_tile_mb)

    def side_args(side, targs):
        idx, vals = [], []
        for i, b in enumerate(side.buckets):
            if targs and i in targs:
                idx.append(tuple(jnp.asarray(x) for x in targs[i][0]))
                vals.append(tuple(jnp.asarray(x) for x in targs[i][1]))
            else:
                idx.append(jnp.asarray(b.idx))
                vals.append(jnp.asarray(b.val))
        return tuple(idx), tuple(vals)

    idx_r, vals_r = side_args(rows, ta_r)
    idx_c, vals_c = side_args(cols, ta_c)
    W0, H0 = init_factors_np(k, m, n, seed=0, entity_major=True)
    W_s = np.zeros((rows.n_slots, k), np.float32)
    W_s[rows.slot_of_entity] = W0
    H_s = np.zeros((cols.n_slots, k), np.float32)
    H_s[cols.slot_of_entity] = H0
    W, H = jnp.asarray(W_s), jnp.asarray(H_s)
    nnz_r = jnp.asarray(rows.slot_nnz)
    nnz_c = jnp.asarray(cols.slot_nnz)
    step = make_als_outer_step(ell, lam, cfg.ell_chunk,
                               precision_name="highest", solver="gj",
                               group_bytes=cfg.als_group_mb << 20,
                               tile_bounds_r=tb_r, tile_bounds_c=tb_c)
    t0 = time.perf_counter()
    W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
    _ = np.asarray(W).sum()
    compile_s = time.perf_counter() - t0

    def grp(g, W, H):
        t0 = time.perf_counter()
        for _ in range(g):
            W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
        _ = np.asarray(W).sum()
        return time.perf_counter() - t0, W, H

    G = 6 if not CPU else 2
    t1s, tgs = [], []
    for _ in range(3 if not CPU else 2):
        d1, W, H = grp(1, W, H)
        dg, W, H = grp(G, W, H)
        t1s.append(d1)
        tgs.append(dg)
    dt = (float(np.median(tgs)) - float(np.median(t1s))) / (G - 1)
    rmse = calrmse_np(T, np.asarray(W)[rows.slot_of_entity],
                      np.asarray(H)[cols.slot_of_entity], entity_major=True)
    lanes = (sum(b.idx.size for b in rows.buckets)
             + sum(b.idx.size for b in cols.buckets))
    return {
        "workload": f"ALS yahoo{tag}-dims synthetic zipf ({m}x{n}, "
                    f"nnz={R.nnz}), k={k}, GJ solve, precision HIGHEST",
        "min_width": ("auto" if cfg.als_min_width == "auto"
                      else int(cfg.als_min_width)),
        "resolved_floors": {"rows": min(b.E for b in rows.buckets),
                            "cols": min(b.E for b in cols.buckets)},
        "als_group_mb": cfg.als_group_mb,
        "gather_tiling": {"tile_mb": cfg.als_gather_tile_mb,
                          "rows_side_tiled_buckets":
                              (len(tb_r) if tb_r else 0),
                          "cols_side_tiled_buckets":
                              (len(tb_c) if tb_c else 0)},
        "pad_factor_vs_nnz": round(lanes / (2 * R.nnz), 3),
        "lanes_padded": int(lanes),
        "compile_s": round(compile_s, 1),
        "iter_s": round(dt, 3),
        "ratings_per_s_M": round(R.nnz / dt / 1e6, 1),
        "rmse_after_iters": round(rmse, 4),
        "device": jax.default_backend(),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    jobs = {"r1": lambda: run_hybrid("r1"),
            "c15": lambda: run_hybrid("c15"),
            "c15_t": lambda: run_hybrid("c15", transpose=True),
            "r1_t": lambda: run_hybrid("r1", transpose=True),
            "als_r1": lambda: run_als("r1"),
            "als_c15": lambda: run_als("c15")}
    names = (["r1", "c15", "als_r1"] if which == "all" else
             which.split(","))
    for name in names:
        rec = jobs[name]()
        rec["name"] = name
        rec["date"] = "2026-08"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
