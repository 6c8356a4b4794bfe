"""Golden cross-check AT THE HEADLINE SCALE: Netflix-100M, k=40, the bf16
NaN-sentinel panel-kernel hybrid vs the loop-faithful NumPy golden solver
from the identical seed-0 init — the reference's dual-backend validation
discipline (/root/reference/src/main.cpp:109-144, golden_compare at
src/extras.cpp:218-238) applied at the largest config the reference's own
sweep exercises, not just at test dims.

Emits results/golden_netflix_100m_r4.json: per-iteration RMSE pairs and
the 10%-relative golden_compare verdict on W and H after 3 outer
iterations.

Usage: python scripts/golden_netflix_scale.py [residual_dtype=bfloat16]
       [out=results/golden_netflix_100m_r4.json]
(TPU; the golden side runs on host NumPy, ~310 s/iter at 100M nnz)

r5 addition (VERDICT r4 weak #6): when entries FAIL the 10% bar, the
record now includes the determination histogram — per-entry relative
error bucketed by entity nnz and by |golden entry| percentile, plus the
conditional bar restricted to well-determined entries — turning the r4
"weakly-determined near-zero entries" interpretation into a measurement.
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

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.eval.metrics import golden_compare   # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import ccd_hybrid_train  # noqa: E402
from cuda_recommender_tpu.solvers.reference import ccd_reference  # noqa: E402

ITERS = 3


def determination_histogram(A, A_ref, deg, rtol=0.10):
    """Failure anatomy for the 10% bar: fail-rate by entity-nnz decile and
    by |golden entry| decile, plus the conditional bar among entries whose
    golden magnitude is above the median AND whose entity has >= the
    median nnz. A (k, n_ent); deg (n_ent,)."""
    A = np.asarray(A, np.float64)
    G = np.asarray(A_ref, np.float64)
    fail = (np.abs(A - G) > rtol * np.abs(G)).ravel()
    mag = np.abs(G).ravel()
    degs = np.broadcast_to(np.asarray(deg, np.float64), A.shape).ravel()
    out = {}
    for name, key in (("by_entity_nnz", degs), ("by_abs_entry", mag)):
        edges = np.quantile(key, np.linspace(0, 1, 11))
        edges[-1] += 1
        which = np.clip(np.searchsorted(edges, key, "right") - 1, 0, 9)
        rates, los = [], []
        for b in range(10):
            sel = which == b
            rates.append(round(float(fail[sel].mean()) if sel.any() else 0.0,
                               5))
            los.append(round(float(edges[b]), 6))
        out[name] = {"decile_lo": los, "fail_rate": rates}
    well = (mag >= np.median(mag)) & (degs >= np.median(degs))
    out["conditional_bar"] = {
        "definition": "entries with |golden| >= median AND entity nnz >= "
                      "median",
        "n": int(well.sum()),
        "fail_rate": round(float(fail[well].mean()), 6),
        "fail_rate_overall": round(float(fail.mean()), 6),
    }
    return out


def main():
    rdt = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    out_path = (sys.argv[2] if len(sys.argv) > 2
                else "results/golden_netflix_100m_r4.json")
    m, n, nnz, k, lam = 480_189, 17_770, 100_000_000, 40, 0.05
    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    W0, H0 = init_factors_np(k, m, n, seed=0)

    cfg = Config(k=k, maxiter=ITERS, lambda_=lam, backend="hybrid",
                 residual_dtype=rdt, mask_dtype="nan",
                 hybrid_dense_cells=6_500_000_000,
                 hybrid_panel_widths=(4096, 2048),
                 hybrid_panel_kernel=True)
    t0 = time.time()
    Wc, Hc, sc = ccd_hybrid_train(R, W0.copy(), H0.copy(), T, cfg)
    t_tpu = time.time() - t0
    print(f"hybrid {ITERS} iters in {t_tpu:.0f}s, rmse "
          f"{[round(s.rmse, 5) for s in sc]}", flush=True)

    Wg, Hg = W0.copy(), H0.copy()
    t0 = time.time()
    sg = ccd_reference(R, Wg, Hg, T, lambda_=lam, maxiter=ITERS,
                       maxinneriter=1)
    t_cpu = time.time() - t0
    print(f"golden {ITERS} iters in {t_cpu:.0f}s, rmse "
          f"{[round(s.rmse, 5) for s in sg]}", flush=True)

    gw = golden_compare(Wc, Wg, atol=1e-3)
    gh = golden_compare(Hc, Hg, atol=1e-3)
    rec = {
        "workload": f"golden cross-check at Netflix-100M k={k}: {rdt} "
                    "NaN-sentinel panel-kernel hybrid vs NumPy golden, "
                    f"{ITERS} outer iters from identical seed-0 init",
        "rmse_hybrid": [round(s.rmse, 6) for s in sc],
        "rmse_golden": [round(s.rmse, 6) for s in sg],
        "golden_W": {"passed": bool(gw.passed),
                     "err_pct": round(gw.error_percentage, 5)},
        "golden_H": {"passed": bool(gh.passed),
                     "err_pct": round(gh.error_percentage, 5)},
        "tolerance": "10% relative per entry (src/extras.cpp:223)",
        "train_s": {"hybrid_tpu": round(t_tpu, 1),
                    "golden_numpy": round(t_cpu, 1)},
        "residual_dtype": rdt,
        "hardware": "TPU v5e 1 chip (axon) + host NumPy, 2026-08-20",
    }
    if not (gw.passed and gh.passed):
        rec["determination_histogram_W"] = determination_histogram(
            Wc, Wg, R.row_nnz)
        rec["determination_histogram_H"] = determination_histogram(
            Hc, Hg, R.col_nnz)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print("RESULT " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
