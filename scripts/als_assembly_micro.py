"""Isolate the ALS gram-assembly cost structure at ml20M k=40 (VERDICT r2
weak #6 follow-up: scripts/als_roofline.py models the iteration floor at
~0.22 s vs 0.465 measured — a 2.1x gap suspiciously equal to the gather
running TWICE).

Hypothesis (from the CCD finding, results/residual_update_micro_r3.json):
``F = other_ext[idx]`` feeds TWO einsums (gram and rhs); its materialized
form would be (S, E, k->128-lane-padded) f32 — 16 GB at ml20M — so XLA fuses
the gather into each einsum's operand load and RE-RUNS it per consumer.

Variants, each ONE jitted program running both ALS sides once per fori_loop
step (value-dependent, iters=I):

  prod   production assembly: two einsums per bucket (gram + rhs)
  aug    augmented single einsum: Faug = [F | val] -> one self-contraction
         (k+1)^2 emits gram AND rhs together — ONE consumer of the gather
  gat    gather floor: lane-sum of F only (one consumer, no MXU work)
  sol    solve-only: feed constant grams/rhs to the Pallas GJ solve

Usage: python scripts/als_assembly_micro.py [iters=6]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os  # noqa: E402

import jax  # noqa: E402

if os.environ.get("CRTPU_BENCH_CPU"):         # tiny CPU dry-run of the flow
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import extend_zero       # noqa: E402
from cuda_recommender_tpu.ops.gj_pallas import gj_solve_pallas_bl  # noqa: E402
from cuda_recommender_tpu.solvers.als_ell import _gram_and_rhs  # noqa: E402

PREC = jax.lax.Precision.HIGHEST


def aug_gram(idx, val, other_ext, b, chunk):
    """Single-einsum assembly: Gaug[a,b,s] = sum_e Faug[s,e,a] Faug[s,e,b]
    with Faug = [F | val] — gram in [:k,:k], rhs in [:k,k]."""
    k = other_ext.shape[1]
    rows, L = idx.shape
    S = rows * b.p

    def acc(idx2, val2):
        F = other_ext[idx2]                                # (S, E', k)
        Faug = jnp.concatenate([F, val2[..., None]], -1)   # (S, E', k+1)
        return jnp.einsum("sea,seb->abs", Faug, Faug,
                          preferred_element_type=jnp.float32, precision=PREC)

    if L <= chunk or b.p > 1:
        Gaug = acc(idx.reshape(S, b.E), val.reshape(S, b.E))
    else:
        nC, rem = divmod(L, chunk)
        idx_s = idx[:, :nC * chunk].reshape(rows, nC, chunk).transpose(1, 0, 2)
        val_s = val[:, :nC * chunk].reshape(rows, nC, chunk).transpose(1, 0, 2)

        def body(carry, sl):
            return carry + acc(sl[0], sl[1]), None

        Gaug, _ = jax.lax.scan(
            body, jnp.zeros((k + 1, k + 1, S), jnp.float32), (idx_s, val_s))
        if rem:
            Gaug = Gaug + acc(idx[:, nC * chunk:], val[:, nC * chunk:])
    return Gaug[:k, :k], Gaug[:k, k]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    if os.environ.get("CRTPU_BENCH_CPU"):
        m, n, nnz, k, lam = 900, 400, 30_000, 8, 0.05
    else:
        m, n, nnz, k, lam = 138_493, 26_744, 20_000_000, 40, 0.05
    R, _ = synthetic_cached(m, n, nnz, seed=3, test_fraction=0.02)
    cfg = Config(solver="als", k=k)
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    rows, cols = ell.rows_side, ell.cols_side
    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, H0 = init_factors_np(k, m, n, seed=0, entity_major=True)
    W_s = np.zeros((rows.n_slots, k), np.float32)
    W_s[rows.slot_of_entity] = W0
    H_s = np.zeros((cols.n_slots, k), np.float32)
    H_s[cols.slot_of_entity] = H0
    eye = jnp.eye(k, dtype=jnp.float32)
    interp = jax.default_backend() == "cpu"

    nnz_r = jnp.asarray(rows.slot_nnz)
    nnz_c = jnp.asarray(cols.slot_nnz)

    def side(mode, idxs, valss, sd, other, nnz_s):
        outs = []
        for i, b in enumerate(sd.buckets):
            if mode == "gat":
                F = other[idxs[i].reshape(-1, b.E)]
                outs.append(F.sum(axis=1))
                continue
            if mode == "prod":
                G_t, r_t = _gram_and_rhs(idxs[i], valss[i], other, b,
                                         cfg.ell_chunk, PREC,
                                         batch_last=True)
            else:                                          # aug
                G_t, r_t = aug_gram(idxs[i], valss[i], other, b,
                                    cfg.ell_chunk)
            A_t = G_t + lam * eye[:, :, None]
            outs.append(gj_solve_pallas_bl(A_t, r_t, interpret=interp).T)
        used = (sd.bucket_offsets[-1] + sd.buckets[-1].slots_per_shard)
        tail = sd.n_slots - used
        new = jnp.concatenate(
            outs + ([jnp.zeros((tail, k), jnp.float32)] if tail else []))
        return jnp.where((nnz_s > 0)[:, None], new * jnp.float32(1e-3), 0.0)

    def make(mode):
        if mode == "sol":
            rng = np.random.default_rng(0)
            A_c = {}
            for tag, sd in (("r", rows), ("c", cols)):
                Ss = sum(b.slots_per_shard for b in sd.buckets)
                A = rng.standard_normal((k, 8, Ss)).astype(np.float32)
                G = jnp.asarray(np.einsum("kes,les->kls", A, A)
                                + 40 * np.eye(k)[:, :, None])
                r = jnp.asarray(rng.standard_normal((k, Ss)), jnp.float32)
                A_c[tag] = (G, r)

            @jax.jit
            def prog(W, H, Gr, rr, Gc, rc, *_):
                def body(t, carry):
                    W, H = carry
                    s = 1e-12 * (t + 1).astype(jnp.float32)
                    xw = gj_solve_pallas_bl(Gr, rr + s * W[:1, :1].sum(),
                                            interpret=interp).T
                    xh = gj_solve_pallas_bl(Gc, rc + s * xw[0, 0],
                                            interpret=interp).T
                    W = W.at[:xw.shape[0]].set(xw)
                    H = H.at[:xh.shape[0]].set(xh)
                    return W, H
                return jax.lax.fori_loop(0, iters, body, (W, H))
            return prog, (A_c["r"][0], A_c["r"][1], A_c["c"][0], A_c["c"][1])

        # everything crosses the jit boundary as ARGUMENTS — closure
        # captures of nnz-scale arrays 413 the tunneled remote compiler
        @jax.jit
        def prog(W, H, idx_r, vals_r, idx_c, vals_c, nnz_r, nnz_c):
            def body(t, carry):
                W, H = carry
                W = side(mode, idx_r, vals_r, rows, extend_zero(H), nnz_r)
                H = side(mode, idx_c, vals_c, cols, extend_zero(W), nnz_c)
                return W, H
            return jax.lax.fori_loop(0, iters, body, (W, H))
        return prog, (idx_r, vals_r, idx_c, vals_c, nnz_r, nnz_c)

    out = {"iters": iters, "k": k}
    for mode in ["prod", "aug", "gat", "sol"]:
        prog, extra = make(mode)
        W, H = jnp.asarray(W_s), jnp.asarray(H_s)
        t0 = time.perf_counter()
        W2, H2 = prog(W, H, *extra)
        _ = float(np.asarray(W2).astype(np.float64).sum()
                  + np.asarray(H2).astype(np.float64).sum())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        W2, H2 = prog(W, H, *extra)
        _ = float(np.asarray(W2).astype(np.float64).sum()
                  + np.asarray(H2).astype(np.float64).sum())
        dt = time.perf_counter() - t0
        out[mode] = {"total_s": round(dt, 3),
                     "per_iter_ms": round(dt / iters * 1e3, 1),
                     "compile_s": round(compile_s, 1)}
        print(f"{mode}: {dt:.3f} s = {dt/iters*1e3:.1f} ms/iter "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
