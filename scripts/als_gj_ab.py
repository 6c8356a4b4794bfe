"""A/B the blocked Gauss-Jordan elimination inside the FULL ALS iteration
at ml20M k=40 with group-difference timing (the micro kernel sweep through
the tunnel is order-noise-dominated — results/gj_block_sweep runs disagree
2x run-to-run; the end-to-end step with fence-cancelling timing is the
decider for the block_r default).

Usage: python scripts/als_gj_ab.py [k=40]
"""

import json
import os
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
from cuda_recommender_tpu.data.datasets import synthetic       # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402
from cuda_recommender_tpu.solvers.als_ell import make_als_outer_step  # noqa: E402


def main():
    k, lam = (int(sys.argv[1]) if len(sys.argv) > 1 else 40), 0.1
    R, _ = synthetic(m=138_493, n=26_744, nnz=20_000_000, seed=1,
                     test_fraction=0.02)
    cfg = Config(solver="als", k=k, lambda_=lam)
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
    nnz_r = jnp.asarray(rows.slot_nnz)
    nnz_c = jnp.asarray(cols.slot_nnz)

    out = {"k": k, "workload": "als ml20M-dims full step, group-diff"}
    GROUP = 6
    for br in (0, 4, 8):
        # block_r passed EXPLICITLY (static arg -> distinct trace-cache
        # keys). The r4 version flipped CRTPU_GJ_BLOCK_R via os.environ
        # in-process, but gj_solve_pallas_bl reads the env var at trace
        # time with block_r=None as the cache key, so arms 2-3 reused
        # arm 1's compiled program (ADVICE.md r4 #1) — the r4 artifact
        # measured r0 three times.
        step = make_als_outer_step(ell, lam, cfg.ell_chunk,
                                   precision_name="highest", solver="gj",
                                   gj_block_r=br)
        W, H = jnp.asarray(W_s), jnp.asarray(H_s)
        t0 = time.perf_counter()
        W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
        _ = np.asarray(W).sum()
        compile_s = time.perf_counter() - t0

        def grp(g, W, H):
            t0 = time.perf_counter()
            for _ in range(g):
                W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r,
                            nnz_c)
            _ = np.asarray(W).sum()
            return time.perf_counter() - t0, W, H

        t1s, tgs = [], []
        for _ in range(3):
            d1, W, H = grp(1, W, H)
            dg, W, H = grp(GROUP, W, H)
            t1s.append(d1)
            tgs.append(dg)
        dt = (float(np.median(tgs)) - float(np.median(t1s))) / (GROUP - 1)
        out[f"block_r{br}"] = {"iter_s": round(dt, 4),
                               "compile_s": round(compile_s, 1)}
        print(f"block_r={br}: {dt*1e3:.1f} ms/iter "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
