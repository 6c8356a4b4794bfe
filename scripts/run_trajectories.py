"""Real-data end-to-end run: ml-1m-calibrated fixture through the FULL
pipeline (text ratings -> cli/convert (native parser) -> reference binary
layout -> binfmt loader -> training), recording compiled-vs-golden RMSE
trajectories per outer iteration — the convergence-parity evidence
BASELINE.md demands (VERDICT round-1 #7). Reference role:
/root/reference/src/main.cpp:109-144 (dual-backend run + validation).

Writes results/rmse_trajectory_ml1m_{ccd,als}.jsonl; each line is one outer
iteration {oiter, rmse_compiled, rmse_golden}; the final line records the
golden_compare verdicts and configuration.

Usage: python scripts/run_trajectories.py [maxiter] [workdir]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if jax.default_backend() not in ("cpu",):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from cuda_recommender_tpu.cli.convert import main as convert_main  # noqa: E402
from cuda_recommender_tpu.core.config import Config                # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np         # noqa: E402
from cuda_recommender_tpu.data import binfmt                       # noqa: E402
from cuda_recommender_tpu.data.datasets import ml1m_like           # noqa: E402
from cuda_recommender_tpu.eval.metrics import golden_compare       # noqa: E402
from cuda_recommender_tpu.models.mf import get_train_fn            # noqa: E402
from cuda_recommender_tpu.solvers.reference import (               # noqa: E402
    als_reference, ccd_reference)


def main():
    maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ml1m_fixture"
    os.makedirs(work, exist_ok=True)
    os.makedirs("results", exist_ok=True)

    # 1) fixture -> text -> convert (native parser) -> binary -> load
    t0 = time.perf_counter()
    R0, T0 = ml1m_like(seed=0)
    txt = os.path.join(work, "ratings.txt")
    if not os.path.exists(os.path.join(work, "bin", "meta_modified_all")):
        ri, ci, vv = R0.to_coo()
        r = np.concatenate([ri, T0.row_idx])
        c = np.concatenate([ci, T0.col_idx])
        v = np.concatenate([vv, T0.val])
        with open(txt, "w") as f:
            for a, b, x in zip(r, c, v):
                f.write(f"{a + 1} {b + 1} {x:.0f}\n")
        convert_main([txt, os.path.join(work, "bin"),
                      "--test-fraction", "0.1", "--seed", "0"])
    R, T = binfmt.load_binary_dataset(os.path.join(work, "bin"))
    print(f"fixture+convert+load: {time.perf_counter()-t0:.1f}s "
          f"({R.rows}x{R.cols} nnz={R.nnz} test={T.nnz})", flush=True)

    backend = jax.default_backend()

    # 2) CCD: compiled (AUTO -> dense at ml1m scale) vs golden, same init
    k, lam = 10, 0.05
    cfg = Config(k=k, maxiter=maxiter, lambda_=lam)
    bk = cfg.resolve_backend(R.rows, R.cols)
    W0, H0 = init_factors_np(k, R.rows, R.cols, seed=0)
    t0 = time.perf_counter()
    Wc, Hc, sc = get_train_fn(cfg.solver, bk)(R, W0.copy(), H0.copy(), T, cfg)
    t_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    Wg, Hg = W0.copy(), H0.copy()
    sg = ccd_reference(R, Wg, Hg, T, lambda_=lam, maxiter=maxiter)
    t_g = time.perf_counter() - t0
    # atol absorbs near-zero entries where the pure relative bar flags
    # sub-1e-4 rounding between equivalent schedules (repo convention,
    # eval/metrics.golden_compare docstring)
    gw = golden_compare(Wc, Wg, atol=1e-3)
    gh = golden_compare(Hc, Hg, atol=1e-3)
    with open("results/rmse_trajectory_ml1m_ccd.jsonl", "w") as f:
        for a, b in zip(sc, sg):
            f.write(json.dumps({"oiter": a.oiter,
                                "rmse_compiled": round(a.rmse, 6),
                                "rmse_golden": round(b.rmse, 6)}) + "\n")
        f.write(json.dumps({
            "summary": True, "solver": "ccd", "backend": bk.value,
            "device": backend, "k": k, "lambda": lam, "maxiter": maxiter,
            "dataset": "ml1m_like(seed=0) via convert->binfmt",
            "golden_W": gw.message(), "golden_H": gh.message(),
            "compiled_train_s": round(t_c, 2),
            "golden_train_s": round(t_g, 2)}) + "\n")
    print(f"CCD done: golden W {gw.message()} H {gh.message()} "
          f"final rmse {sc[-1].rmse:.4f} vs {sg[-1].rmse:.4f}", flush=True)

    # 2b) hybrid compressed-storage configs vs golden — full-convergence
    # evidence for the flagship dtype choices. MEASURED VERDICTS (this
    # script's committed artifacts): bf16 residual + int8 mask tracks the
    # golden trajectory and passes golden_compare (the bench.py headline
    # config); fp8-e4m3 residual STALLS at a visibly worse plateau at 15
    # iters (the residual's ~6% storage quantization feeds back through
    # the rank recursion) — fp8 is therefore opt-in, not the default.
    for tag, rdt, mdt, kern in (("bf16_int8", "bfloat16", "int8", False),
                                ("fp8", "float8_e4m3fn", "int8", False),
                                ("bf16_nan_kernel", "bfloat16", "nan", True)):
        cfg_h = Config(k=k, maxiter=maxiter, lambda_=lam, backend="hybrid",
                       residual_dtype=rdt, mask_dtype=mdt,
                       hybrid_panel_kernel=kern,
                       hybrid_dense_cells=2000 * R.cols)
        t0 = time.perf_counter()
        Wh, Hh, sh = get_train_fn(cfg_h.solver, cfg_h.backend)(
            R, W0.copy(), H0.copy(), T, cfg_h)
        t_h = time.perf_counter() - t0
        gwh = golden_compare(Wh, Wg, atol=1e-3)
        ghh = golden_compare(Hh, Hg, atol=1e-3)
        out = f"results/rmse_trajectory_ml1m_hybrid_{tag}.jsonl"
        with open(out, "w") as f:
            for a, b in zip(sh, sg):
                f.write(json.dumps({"oiter": a.oiter,
                                    "rmse_compiled": round(a.rmse, 6),
                                    "rmse_golden": round(b.rmse, 6)}) + "\n")
            f.write(json.dumps({
                "summary": True, "solver": "ccd",
                "backend": (f"hybrid {rdt} residual + {mdt} mask"
                            + (" + pallas panel kernels" if kern else "")),
                "device": backend, "k": k, "lambda": lam,
                "maxiter": maxiter,
                "dataset": "ml1m_like(seed=0) via convert->binfmt",
                "golden_W": gwh.message(), "golden_H": ghh.message(),
                "max_abs_rmse_gap": round(max(
                    abs(a.rmse - b.rmse) for a, b in zip(sh, sg)), 6),
                "compiled_train_s": round(t_h, 2)}) + "\n")
        print(f"hybrid-{tag} done: golden W {gwh.message()} H "
              f"{ghh.message()} final rmse {sh[-1].rmse:.4f} vs "
              f"{sg[-1].rmse:.4f}", flush=True)

    # 3) ALS: compiled ELL vs golden
    cfg_a = Config(solver="als", k=k, maxiter=maxiter, lambda_=lam)
    bk_a = cfg_a.resolve_backend(R.rows, R.cols)
    Wa0, Ha0 = init_factors_np(k, R.rows, R.cols, seed=0, entity_major=True)
    t0 = time.perf_counter()
    Wca, Hca, sca = get_train_fn(cfg_a.solver, bk_a)(
        R, Wa0.copy(), Ha0.copy(), T, cfg_a)
    t_ca = time.perf_counter() - t0
    t0 = time.perf_counter()
    Wga, Hga = Wa0.copy(), Ha0.copy()
    sga = als_reference(R, Wga, Hga, T, lambda_=lam, maxiter=maxiter)
    t_ga = time.perf_counter() - t0
    gwa, gha = golden_compare(Wca, Wga, atol=1e-3), \
        golden_compare(Hca, Hga, atol=1e-3)
    with open("results/rmse_trajectory_ml1m_als.jsonl", "w") as f:
        for a, b in zip(sca, sga):
            f.write(json.dumps({"oiter": a.oiter,
                                "rmse_compiled": round(a.rmse, 6),
                                "rmse_golden": round(b.rmse, 6)}) + "\n")
        f.write(json.dumps({
            "summary": True, "solver": "als", "backend": bk_a.value,
            "device": backend, "k": k, "lambda": lam, "maxiter": maxiter,
            "dataset": "ml1m_like(seed=0) via convert->binfmt",
            "golden_W": gwa.message(), "golden_H": gha.message(),
            "compiled_train_s": round(t_ca, 2),
            "golden_train_s": round(t_ga, 2)}) + "\n")
    print(f"ALS done: golden W {gwa.message()} H {gha.message()} "
          f"final rmse {sca[-1].rmse:.4f} vs {sga[-1].rmse:.4f}", flush=True)


if __name__ == "__main__":
    main()
