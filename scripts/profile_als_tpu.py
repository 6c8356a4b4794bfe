"""Decompose the ALS ELL iteration cost at ml20M k=40 on the TPU.

Round-1 left ALS at 0.56 s/iter vs a ~0.35 s traffic/FLOP model
(ARCHITECTURE.md roadmap #1, VERDICT #4) with the gap attributed to
"gram/gather scheduling". This measures where the time actually goes by
timing structurally-reduced variants of the same step (all through the
persistent compile cache, so re-runs are cheap):

  full       gather + gram + rhs + Pallas-GJ solve (production step)
  nosolve    gather + gram + rhs (solve replaced by x = r)
  rhsonly    gather + rhs (gram replaced by broadcast identity)
  gather     gather + lane-sum only (forces the gathers, no MXU work)
  high       full step with Precision.HIGH (bf16_3x) gram instead of HIGHEST

Usage: python scripts/profile_als_tpu.py [k] [nnz_millions]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if os.environ.get("CRTPU_BENCH_CPU"):         # tiny CPU dry-run of the flow
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic       # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import extend_zero       # noqa: E402
from cuda_recommender_tpu.solvers import als_ell               # noqa: E402


def make_variant(ell, lam, chunk, mode):
    rows, cols = ell.rows_side, ell.cols_side
    lam_ = jnp.float32(lam)
    prec = (jax.lax.Precision.HIGH if mode == "high"
            else jax.lax.Precision.HIGHEST)

    def side(idx_tiles, val_tiles, s, other_ext, slot_nnz):
        k = other_ext.shape[1]
        eye = jnp.eye(k, dtype=jnp.float32)
        outs = []
        for i, b in enumerate(s.buckets):
            if mode == "gather":
                F = other_ext[idx_tiles[i].reshape(-1, b.E)]
                outs.append(F.sum(axis=1))
                continue
            if mode == "rhsonly":
                F = other_ext[idx_tiles[i].reshape(-1, b.E)]
                r = jnp.einsum("sek,se->sk", F,
                               val_tiles[i].reshape(-1, b.E),
                               preferred_element_type=jnp.float32,
                               precision=prec)
                outs.append(r)
                continue
            G, r = als_ell._gram_and_rhs(idx_tiles[i], val_tiles[i],
                                         other_ext, b, chunk, prec)
            A = G + lam_ * eye
            if mode == "nosolve":
                outs.append(r + A[:, :, 0])
            else:
                outs.append(als_ell._solve_kxk(A, r, "gj"))
        used = s.bucket_offsets[-1] + s.buckets[-1].slots_per_shard
        tail = s.n_slots - used
        new = jnp.concatenate(
            outs + ([jnp.zeros((tail, k), jnp.float32)] if tail else []))
        return jnp.where((slot_nnz > 0)[:, None], new, 0.0)

    def step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c):
        W = side(idx_r, vals_r, rows, extend_zero(H), nnz_r)
        H = side(idx_c, vals_c, cols, extend_zero(W), nnz_c)
        return W, H

    return jax.jit(step, donate_argnums=(4, 5))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    nnz = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 20_000_000
    m = int(os.environ.get("CRTPU_BENCH_M", 138_493))   # ml20M dims
    n = int(os.environ.get("CRTPU_BENCH_N", 26_744))
    lam = 0.1
    print(f"backend={jax.default_backend()} m={m} n={n} nnz={nnz} k={k}",
          flush=True)
    R, _T = synthetic(m=m, n=n, nnz=nnz, seed=1, test_fraction=0.02)
    cfg = Config(solver="als", k=k, lambda_=lam)
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    rows, cols = ell.rows_side, ell.cols_side
    print(f"padded rows-side {sum(b.idx.size for b in rows.buckets)} "
          f"cols-side {sum(b.idx.size for b in cols.buckets)}", flush=True)

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, H0 = init_factors_np(k, m, n, seed=0, entity_major=True)
    nnz_r = jnp.asarray(rows.slot_nnz)
    nnz_c = jnp.asarray(cols.slot_nnz)

    results = {}
    for mode in ("full", "nosolve", "rhsonly", "gather", "high"):
        W_s = np.zeros((rows.n_slots, k), np.float32)
        W_s[rows.slot_of_entity] = W0
        H_s = np.zeros((cols.n_slots, k), np.float32)
        H_s[cols.slot_of_entity] = H0
        W, H = jnp.asarray(W_s), jnp.asarray(H_s)
        step = make_variant(ell, lam, cfg.ell_chunk, mode)
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
        results[mode] = round(dt, 4)
        print(f"{mode}: {dt*1e3:.0f} ms/iter (compile+1st {compile_s:.0f}s)",
              flush=True)

    print("RESULT " + json.dumps({
        "workload": "als decomposition ml20M dims", "k": k,
        "nnz": int(R.nnz), "iter_s": results}), flush=True)


if __name__ == "__main__":
    main()
