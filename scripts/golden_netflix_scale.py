"""Golden cross-check AT THE HEADLINE SCALE: Netflix-100M, k=40, the bf16
NaN-sentinel panel-kernel hybrid vs the loop-faithful NumPy golden solver
from the identical seed-0 init — the reference's dual-backend validation
discipline (/root/reference/src/main.cpp:109-144, golden_compare at
src/extras.cpp:218-238) applied at the largest config the reference's own
sweep exercises, not just at test dims.

Emits results/golden_netflix_100m_r4.json: per-iteration RMSE pairs and
the 10%-relative golden_compare verdict on W and H after 3 outer
iterations.

Usage: python scripts/golden_netflix_scale.py   (TPU; the golden side runs
on host NumPy, ~310 s/iter at 100M nnz)
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


def main():
    m, n, nnz, k, lam = 480_189, 17_770, 100_000_000, 40, 0.05
    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    W0, H0 = init_factors_np(k, m, n, seed=0)

    cfg = Config(k=k, maxiter=ITERS, lambda_=lam, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
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
        "workload": f"golden cross-check at Netflix-100M k={k}: bf16 "
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
        "hardware": "TPU v5e 1 chip (axon) + host NumPy, 2026-08-20",
    }
    with open("results/golden_netflix_100m_r4.json", "w") as f:
        json.dump(rec, f, indent=1)
    print("RESULT " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
