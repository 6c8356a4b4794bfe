"""Measure the panel-hybrid CCD++ backend at Netflix dims on the TPU.

North-star config (BASELINE.md / VERDICT round 1 next-#1): Netflix-100M-scale
CCD++. Round-1 comparison row: pure padded-ELL at these dims (50M nnz, k=40)
ran ~24 s/outer-iter = 80 M rating-updates/s, at the gather roofline.

Methodology (memory: axon quirks): ship each panel as COO and scatter on
device (one jitted densify program, bf16 direct — an f32 intermediate at a
2.7e9-cell panel would itself OOM), ELL buckets host-built and shipped;
exactly TWO compiled programs (densify, step); FULL-tensor readback fences
with the transfer cost measured separately and subtracted (bench.py
pattern). RMSE sanity is computed host-side in fp64.

Usage: python scripts/bench_hybrid_tpu.py [nnz_millions] [k] [budget_cells_B]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("CRTPU_BENCH_CPU"):         # tiny CPU dry-run of the flow
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: measured working through the axon tunnel
# (115 s cold -> 0.8 s warm); makes re-runs and repeats cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                       # noqa: E402
import functools                              # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic       # noqa: E402
from cuda_recommender_tpu.eval.metrics import calrmse_np       # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import (          # noqa: E402
    make_hybrid_outer_step, plan_hybrid)


def main():
    nnz = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 50_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cells = (int(float(sys.argv[3]) * 1e9) if len(sys.argv) > 3
             else 2_000_000_000)
    m = int(os.environ.get("CRTPU_BENCH_M", 480_189))
    n = int(os.environ.get("CRTPU_BENCH_N", 17_770))
    mask_dtype = os.environ.get("CRTPU_MASK_DTYPE", "bfloat16")
    panel_kernel = bool(int(os.environ.get("CRTPU_PANEL_KERNEL", "1")))
    widths = tuple(int(w) for w in os.environ.get(
        "CRTPU_PANEL_WIDTHS", "2048,256").split(",") if w)
    lam = 0.05
    print(f"backend={jax.default_backend()} m={m} n={n} nnz={nnz} k={k} "
          f"budget={cells} mask={mask_dtype}", flush=True)

    t0 = time.perf_counter()
    from cuda_recommender_tpu.data.datasets import synthetic_cached
    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    print(f"synthetic gen/load: {time.perf_counter()-t0:.1f}s "
          f"(actual nnz={R.nnz})", flush=True)

    res_dtype = os.environ.get("CRTPU_RESIDUAL_DTYPE", "bfloat16")
    cfg = Config(k=k, lambda_=lam, backend="hybrid",
                 residual_dtype=res_dtype, hybrid_dense_cells=cells,
                 hybrid_panel_widths=widths, mask_dtype=mask_dtype,
                 hybrid_panel_kernel=panel_kernel)
    t0 = time.perf_counter()
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    pad_r = sum(b.idx.size for b in rows.buckets)
    print(f"plan: {time.perf_counter()-t0:.1f}s panels={plan.panels} "
          f"nnz_light={plan.nnz_light} ({100*plan.nnz_light/R.nnz:.1f}%) "
          f"ell_padded_rows_side={pad_r}", flush=True)

    rdt = jnp.dtype(res_dtype)

    t0 = time.perf_counter()
    from cuda_recommender_tpu.solvers.ccd_hybrid import densify_panels
    Rds, masks = densify_panels(plan, rdt, mask_dtype=mask_dtype,
                                block_pad=panel_kernel)
    print(f"densify(+COO ship): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, _ = init_factors_np(k, m, n, seed=0)
    W = jnp.asarray(W0[:, plan.user_order])
    H = jnp.zeros((k, n), jnp.float32)
    u_pend = jnp.zeros(m, jnp.float32)
    v_pend = jnp.zeros(n, jnp.float32)
    row_nnz = jnp.asarray(plan.row_nnz)
    col_nnz = jnp.asarray(plan.col_nnz)
    upos_safe = jnp.asarray(plan.upos_of_slot_safe)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)
    sou = jnp.asarray(plan.slot_of_upos)
    soi = jnp.asarray(plan.slot_of_ipos)
    jax.block_until_ready(vals_r)
    print(f"ELL ship: {time.perf_counter()-t0:.1f}s", flush=True)

    step = make_hybrid_outer_step(plan, lam, 1, residual_dtype=rdt,
                                  nan_mask=mask_dtype == "nan",
                                  panel_kernel=panel_kernel)

    def run_step(s):
        return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                    s[5], s[6], row_nnz, col_nnz, upos_safe, ipos_safe,
                    sou, soi)

    s = (Rds, vals_r, vals_c, W, H, u_pend, v_pend)
    t0 = time.perf_counter()
    s = run_step(s)
    _ = np.asarray(s[3]).sum()                      # full fence (W, k*m f32)
    print(f"compile+first iter: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    s = run_step(s)
    _ = np.asarray(s[3]).sum()
    print(f"warm iter (incl fence): {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(s[3]).sum()
    t_xfer = time.perf_counter() - t0               # pure readback cost

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        s = run_step(s)
    _ = np.asarray(s[3]).sum()
    dt = (time.perf_counter() - t0 - t_xfer) / iters

    # host-side RMSE sanity (fp64)
    W_ent = np.asarray(s[3])[:, plan.user_pos]
    H_ent = np.asarray(s[4])[:, plan.item_pos]
    rmse = calrmse_np(T, W_ent, H_ent, entity_major=False)

    out = {
        "workload": "panel-hybrid CCD++ Netflix dims",
        "m": m, "n": n, "nnz": int(R.nnz), "k": k,
        "panels": [list(p) for p in plan.panels],
        "nnz_light_frac": round(plan.nnz_light / R.nnz, 4),
        "outer_iter_s": round(dt, 3),
        "rating_updates_per_s_M": round(R.nnz * k / dt / 1e6, 1),
        "vs_round1_ell_80M": round(R.nnz * k / dt / 80e6, 2),
        "rmse_after_5_iters": round(rmse, 4),
        "mask_dtype": mask_dtype, "panel_kernel": panel_kernel,
        "residual_dtype": res_dtype,
        "t_xfer_s": round(t_xfer, 3),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
