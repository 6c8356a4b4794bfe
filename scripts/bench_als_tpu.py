"""ALS round-2 measurements: batch-last GJ layout + bf16_3x gram precision.

(1) ml20M-dims full-step timing, solver=gj with the new batch-last gram
    emission (no (S,k,k)->(k,k,S) relayout before the Pallas solve), at
    precision HIGHEST and HIGH.
(2) ml1m-fixture golden validation of precision=HIGH on real TPU matmuls
    (CPU tests cannot exercise bf16_3x numerics): 10 Gauss-Seidel
    iterations vs the NumPy golden solver.

Usage: python scripts/bench_als_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import ml1m_like, synthetic  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402
from cuda_recommender_tpu.eval.metrics import (                # noqa: E402
    calrmse_np, golden_compare)
from cuda_recommender_tpu.solvers.als_ell import (             # noqa: E402
    als_ell_train, make_als_outer_step)
from cuda_recommender_tpu.solvers.reference import als_reference  # noqa: E402


def time_step(R, k, lam, precision):
    cfg = Config(solver="als", k=k, lambda_=lam, als_precision=precision)
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    rows, cols = ell.rows_side, ell.cols_side
    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, H0 = init_factors_np(k, R.rows, R.cols, seed=0, entity_major=True)
    W_s = np.zeros((rows.n_slots, k), np.float32)
    W_s[rows.slot_of_entity] = W0
    H_s = np.zeros((cols.n_slots, k), np.float32)
    H_s[cols.slot_of_entity] = H0
    W, H = jnp.asarray(W_s), jnp.asarray(H_s)
    nnz_r = jnp.asarray(rows.slot_nnz)
    nnz_c = jnp.asarray(cols.slot_nnz)
    step = make_als_outer_step(ell, lam, cfg.ell_chunk,
                               precision_name=precision, solver="gj")
    t0 = time.perf_counter()
    W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
    _ = np.asarray(W).sum()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(W).sum()
    t_xfer = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
    _ = np.asarray(W).sum()
    dt = (time.perf_counter() - t0 - t_xfer) / iters
    print(f"ml20M k={k} precision={precision}: {dt*1e3:.0f} ms/iter "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def main():
    k, lam = (int(sys.argv[1]) if len(sys.argv) > 1 else 40), 0.1
    R, _T = synthetic(m=138_493, n=26_744, nnz=20_000_000, seed=1,
                      test_fraction=0.02)
    dt_highest = time_step(R, k, lam, "highest")
    if k != 40:          # custom-rank timing row (e.g. the k=128 north-star)
        print("RESULT " + json.dumps({
            "workload": f"als ml20M k={k} (batch-last GJ)",
            "iter_s_highest": round(dt_highest, 4),
            "ratings_per_s_M": round(R.nnz / dt_highest / 1e6, 1),
        }), flush=True)
        return
    dt_high = time_step(R, k, lam, "high")

    # golden validation of precision=high on real TPU matmuls
    Rf, Tf = ml1m_like(seed=0)
    W0, H0 = init_factors_np(10, Rf.rows, Rf.cols, seed=0, entity_major=True)
    cfg = Config(solver="als", k=10, maxiter=10, lambda_=0.05,
                 als_precision="high", fused_outer_iters=10)
    Wc, Hc, sc = als_ell_train(Rf, W0.copy(), H0.copy(), Tf, cfg)
    Wg, Hg = W0.copy(), H0.copy()
    sg = als_reference(Rf, Wg, Hg, Tf, lambda_=0.05, maxiter=10)
    gw = golden_compare(Wc, Wg, atol=1e-3)
    gh = golden_compare(Hc, Hg, atol=1e-3)
    rmse_c = calrmse_np(Tf, Wc, Hc, entity_major=True)
    print("high-precision golden: W %s (%.4f%%) H %s (%.4f%%) "
          "rmse %.5f vs golden %.5f"
          % (gw.message(), gw.error_percentage, gh.message(),
             gh.error_percentage, rmse_c, sg[-1].rmse), flush=True)

    print("RESULT " + json.dumps({
        "workload": "als ml20M k=40 (batch-last GJ)",
        "iter_s_highest": round(dt_highest, 4),
        "iter_s_high": round(dt_high, 4),
        "round1_baseline_s": 0.801,
        "high_golden_W_pass": gw.passed, "high_golden_H_pass": gh.passed,
        "high_golden_err_pct": round(max(gw.error_percentage,
                                         gh.error_percentage), 5),
        "ml1m_rmse_high_vs_golden": [round(rmse_c, 5),
                                     round(sg[-1].rmse, 5)],
    }), flush=True)


if __name__ == "__main__":
    main()
