"""Attribute the yahoo-r1 ALS iteration (VERDICT r4 #3 follow-through).

The r5 auto-floor A/B proved yahoo-r1 ALS is not lane-volume-bound
(lanes -23% -> time flat at ~9.6 s/iter, ~5x the analytic floor of
lanes x 3.9 ns + gram MXU + GJ solve ~ 2 s), and the padded gram temp
explains only ~0.12 s. This script splits each HALF-iteration
(_solve_side) into:

  full      gather + augmented gram assembly + Pallas GJ solve
            (the production path)
  nosolve   gather + gram only — the solve_group body returns the
            gram/rhs reductions instead of solving, everything else
            (row groups, lax.map serialization) identical

solve cost = full - nosolve; gather+gram vs its analytic model comes out
of nosolve. DCE discipline (MEMORY dce-contaminated-micros): dynamic-trip
fori_loop whose accumulator feeds back into the factor-table argument
(an (n_slots, k) elementwise op, negligible vs seconds), outputs reduced
through full-tensor sums, 10 MB dependent readback fence,
group-difference timing.

Usage: python scripts/als_r1_decompose.py [side=rows|cols|both] [ngroup=4]
Emits results/als_r1_decompose_r5.json (merges existing file).
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
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import extend_zero       # noqa: E402
from cuda_recommender_tpu.solvers.als_ell import (             # noqa: E402
    GROUP_TEMP_BYTES, _gram_and_rhs, _row_groups, _solve_side)

M, N, NNZ, K, LAM = 1_948_883, 98_211, 115_000_000, 40, 0.05
if os.environ.get("CRTPU_R1_HALF"):
    # the full-dims fori-wrapped programs break the tunnel compiler
    # (broken pipe twice); HALF dims preserve the regime exactly — avg
    # user degree 59, auto floor 32, same bucket structure — with half
    # the lax.map groups per bucket
    M, NNZ = 974_441, 57_500_000
OUT = "results/als_r1_decompose_r5.json"


def _nosolve_side(idx_tiles, val_tiles, side, other_ext, chunk, group_bytes):
    """_solve_side with the GJ solve replaced by full-tensor reductions of
    the assembled gram/rhs — same groups, same lax.map serialization, same
    gather/einsum work; returns a (n_buckets,) vector of sums."""
    k = other_ext.shape[1]
    acc = []
    for i, b in enumerate(side.buckets):
        rows = idx_tiles[i].shape[0]
        groups = _row_groups(rows, b.L, b.p, k, group_bytes)

        def gram_group(idxg, valg):
            G_t, r_t = _gram_and_rhs(idxg, valg, other_ext, b, chunk,
                                     jax.lax.Precision.HIGHEST,
                                     batch_last=True, augmented=True)
            return G_t.sum() + r_t.sum()

        if len(groups) == 1:
            acc.append(gram_group(idx_tiles[i], val_tiles[i]))
            continue
        g = groups[0][1]
        nfull = rows // g
        idxg = idx_tiles[i][:nfull * g].reshape(nfull, g, b.L)
        valg = val_tiles[i][:nfull * g].reshape(nfull, g, b.L)
        xs = jax.lax.map(lambda a: gram_group(a[0], a[1]), (idxg, valg))
        s = xs.sum()
        if rows > nfull * g:
            s = s + gram_group(idx_tiles[i][nfull * g:],
                               val_tiles[i][nfull * g:])
        acc.append(s)
    return jnp.stack(acc)


def time_mode(fn, arg, n_group, reps=3):
    """Plain repeated-dispatch group-difference timing (the
    yahoo_robustness pattern): fn is a separately-jitted call whose
    RETURNED output is fenced — returned jit outputs are always fully
    computed (tail_floor_r4 methodology), and a fori-wrapped variant of
    these side-sized programs breaks the tunnel compiler (broken pipe at
    serialization). Calls queue on the device stream; the fence cost
    cancels in the group difference."""
    t0 = time.perf_counter()
    out = fn(arg)
    _ = np.asarray(out).sum()
    compile_s = time.perf_counter() - t0

    def grp(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(arg)
        _ = np.asarray(out).sum()
        return time.perf_counter() - t0

    grp(1)                                       # warm
    t1s, tgs = [], []
    for _ in range(reps):
        t1s.append(grp(1))
        tgs.append(grp(n_group))
    per = (float(np.median(tgs)) - float(np.median(t1s))) / (n_group - 1)
    return {"per_call_s": round(per, 3), "compile_s": round(compile_s, 1),
            "t1_samples_s": [round(x, 2) for x in t1s],
            "tg_samples_s": [round(x, 2) for x in tgs],
            "n_group": n_group}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    ngroup = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    R, _ = synthetic_cached(M, N, NNZ, seed=11, test_fraction=0.02)
    cfg = Config(solver="als", k=K, lambda_=LAM)
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    gb = cfg.als_group_mb << 20
    W0, H0 = init_factors_np(K, M, N, seed=0, entity_major=True)

    try:
        out = json.load(open(OUT))
    except (OSError, json.JSONDecodeError):
        out = {"workload": "yahoo-r1 ALS half-iteration decomposition "
                           "(full vs gram-only), auto floor, k=40",
               "dims": {"m": M, "n": N, "nnz": NNZ},
               "hardware": "TPU v5e 1 chip (axon tunnel), 2026-08-21"}

    sides = {"rows": (ell.rows_side, ell.cols_side, W0, H0),
             "cols": (ell.cols_side, ell.rows_side, H0, W0)}
    names = ["rows", "cols"] if which == "both" else [which]
    for name in names:
        side, other, _, other0 = sides[name]
        idx = tuple(jnp.asarray(b.idx) for b in side.buckets)
        vals = tuple(jnp.asarray(b.val) for b in side.buckets)
        O_s = np.zeros((other.n_slots, K), np.float32)
        O_s[other.slot_of_entity] = other0
        O = jnp.asarray(O_s)
        nnz_slot = jnp.asarray(side.slot_nnz)
        lanes = int(sum(b.idx.size for b in side.buckets))
        rec = {"lanes_padded": lanes,
               "slots": int(side.n_slots),
               "buckets": [[int(b.E), int(b.idx.shape[0])]
                           for b in side.buckets]}

        @jax.jit
        def run_full(O_):
            return _solve_side(idx, vals, side, extend_zero(O_),
                               jnp.float32(LAM), nnz_slot, cfg.ell_chunk,
                               solver="gj", group_bytes=gb)

        r = time_mode(run_full, O, ngroup)
        rec["full"] = r
        print(f"{name} full: {r}", flush=True)

        @jax.jit
        def run_nosolve(O_):
            return _nosolve_side(idx, vals, side, extend_zero(O_),
                                 cfg.ell_chunk, gb)

        r = time_mode(run_nosolve, O, ngroup)
        rec["nosolve"] = r
        print(f"{name} nosolve: {r}", flush=True)

        rec["solve_s"] = round(rec["full"]["per_call_s"]
                               - rec["nosolve"]["per_call_s"], 3)
        rec["analytic_gather_issue_s"] = round(lanes * 3.9e-9, 3)
        out[name] = rec
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print("RESULT " + json.dumps({k: v for k, v in out.items()
                                  if k in ("rows", "cols")}), flush=True)


if __name__ == "__main__":
    main()
