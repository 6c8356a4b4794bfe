"""Decompose the headline hybrid iteration: full vs panels-only vs tail-only.

The headline (Netflix-100M, NaN-sentinel bf16 + fused panel kernels) measures
5.5-5.8 s/iter, but the kernel microbench (results/panel_kernel_micro_r2.json,
11.7 ps/cell) scaled to the 6.48e9-cell stair predicts ~3.0 s of panel work
and the 3.3 ns/row gather model ~0.5 s of ELL tail — ~2 s/iter unexplained.
This script times three variants of the SAME compiled rank loop on the SAME
plan so the difference isolates where the time goes:

  full         the production step (panels + ELL tail)
  panels_only  dataclasses.replace(plan, nnz_light=0) — tail code compiled out
  tail_only    panels=() — panel code compiled out

Numerics of the ablated variants are intentionally wrong (they skip part of
the matrix); only wall time is read. Timing per the axon rules: full-tensor
readback fence, transfer cost measured separately and subtracted, persistent
compile cache on.

Usage: python scripts/decompose_hybrid_tpu.py [nnz_millions=100] [k=40]
       [budget_cells_B=6.5]
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                                        # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import (          # noqa: E402
    densify_panels, make_hybrid_outer_step, plan_hybrid)


def time_step(step, idx_r, idx_c, masks, s, consts, group=4):
    """s = (Rds, vals_r, vals_c, W, H, u_pend, v_pend) — the step's carry.
    Group-difference timing (bench.py / results/headline_variance_r3.json):
    per-iter = (median T_Ggrp - median T_1grp)/(G-1), the fresh-fence
    readback term cancels (the old subtract-t_xfer approach re-read a
    cached jax.Array and under-measured the fence by ~2-8 s)."""
    def run(s):
        return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                    s[5], s[6], *consts)

    t0 = time.perf_counter()
    s = run(s)
    _ = np.asarray(s[3]).sum()                      # full fence on W
    compile_s = time.perf_counter() - t0
    s = run(s)
    _ = np.asarray(s[3]).sum()

    def grp(g, s):
        t0 = time.perf_counter()
        for _ in range(g):
            s = run(s)
        _ = np.asarray(s[3]).sum()
        return time.perf_counter() - t0, s

    t1s, tgs = [], []
    for _ in range(4):
        d1, s = grp(1, s)
        dg, s = grp(group, s)
        t1s.append(d1)
        tgs.append(dg)
    dt = (float(np.median(tgs)) - float(np.median(t1s))) / (group - 1)
    return dt, compile_s


def main():
    nnz = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    cells = (int(float(sys.argv[3]) * 1e9) if len(sys.argv) > 3
             else 6_500_000_000)
    import os
    if os.environ.get("CRTPU_BENCH_CPU"):        # tiny CPU dry-run
        jax.config.update("jax_platforms", "cpu")
    m = int(os.environ.get("CRTPU_BENCH_M", 480_189))
    n = int(os.environ.get("CRTPU_BENCH_N", 17_770))
    lam = 0.05

    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=lam, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=cells, hybrid_panel_widths=(4096, 2048))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    rdt = jnp.dtype("bfloat16")

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    W0, _ = init_factors_np(k, m, n, seed=0)
    consts = (jnp.asarray(plan.row_nnz), jnp.asarray(plan.col_nnz),
              jnp.asarray(plan.upos_of_slot_safe),
              jnp.asarray(plan.ipos_of_slot_safe),
              jnp.asarray(plan.slot_of_upos), jnp.asarray(plan.slot_of_ipos))

    out = {"workload": "hybrid decomposition, Netflix-100M NaN-sentinel "
                       "bf16 panel-kernel", "k": k,
           "panels": [list(p) for p in plan.panels],
           "nnz_light": int(plan.nnz_light)}

    variants = {
        "full": plan,
        "panels_only": dataclasses.replace(plan, nnz_light=0),
        "tail_only": dataclasses.replace(plan, panels=()),
    }
    defer_g = int(os.environ.get("CRTPU_DEFER_GROUP", "8"))
    out["defer_group"] = defer_g
    for name, pvar in variants.items():
        step = make_hybrid_outer_step(pvar, lam, 1, residual_dtype=rdt,
                                      nan_mask=True, panel_kernel=True,
                                      defer_group=defer_g)
        # fresh device state per variant: every state arg is DONATED by the
        # jitted step, so buffers from the previous variant are dead
        Rv = (densify_panels(plan, rdt, mask_dtype="nan", block_pad=True)[0]
              if pvar.panels else ())
        s0 = (Rv,
              tuple(jnp.asarray(b.val) for b in rows.buckets),
              tuple(jnp.asarray(b.val) for b in cols.buckets),
              jnp.asarray(W0[:, plan.user_order]),
              jnp.zeros((k, n), jnp.float32),
              jnp.zeros(m, jnp.float32), jnp.zeros(n, jnp.float32))
        dt, compile_s = time_step(step, idx_r, idx_c, (), s0, consts)
        del s0, Rv
        out[name] = {"iter_s": round(dt, 3), "compile_s": round(compile_s, 1)}
        print(f"{name}: {dt:.3f} s/iter (compile {compile_s:.1f}s)",
              flush=True)

    glue = (out["full"]["iter_s"] - out["panels_only"]["iter_s"]
            - out["tail_only"]["iter_s"])
    out["additivity_gap_s"] = round(glue, 3)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
