"""Derive the ALS ELL iteration's hardware floor at ml20M dims (VERDICT r2
weak #6: the ~0.45 s/iter claim cited a gather-issue floor with no committed
derivation). Emits the per-term model from the ACTUAL built layout plus the
measured step time, as results/als_roofline_r3.json.

Terms (one Gauss-Seidel iteration = both sides; reference role
/root/reference/src/ALS.cpp:81-233):

  gather_issue   every padded ELL lane row-gathers one k-wide factor row:
                 (lanes_r + lanes_c) x GATHER_S_PER_ROW (~3.3 ns/row,
                 measured row-mode issue rate, ARCHITECTURE.md)
  gather_bytes   the same gathers move lanes x k x 4 B through HBM
                 (819 GB/s v5e); per side the realized cost is
                 max(issue, bytes) — they are the same hardware unit
  gram_mxu       gram+rhs assembly lanes x (k^2 + k) x 2 FLOP on the MXU at
                 f32-equivalent rate (HIGHEST = 6-pass bf16: ~197/6 TF/s)
  gj_solve       Pallas VMEM-blocked Gauss-Jordan: stream (S, k, k+1) f32 in
                 + (S, k) out at 819 GB/s, plus S x k^2 x (k+1) x 2 VPU FLOPs
                 at ~3.9 TF/s f32 (8x128 VPU, ~940 MHz, 4 lanes FMA)
  factor_io      write the new (S, k) factors + read the other-side table

Floor per side = max(gather term, HBM term) + gram_mxu + gj_solve (the MXU
work cannot overlap the gathers that feed it at bucket granularity, so the
sum is the honest per-side floor; overlap across buckets would shave at most
the smaller term).

Usage: python scripts/als_roofline.py [k=40]   (pure host arithmetic — the
layout is built once; no TPU needed; pass --measure to also time the real
step on the current backend)
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair       # noqa: E402

GATHER_S_PER_ROW = 3.3e-9
HBM_BYTES_PER_S = 819e9
MXU_F32EQ_FLOPS = 197e12 / 6          # HIGHEST = 6-pass bf16
VPU_F32_FLOPS = 3.9e12


def side_terms(side, k: int) -> dict:
    lanes = sum(b.idx.size for b in side.buckets)
    slots = side.n_slots
    gather_issue = lanes * GATHER_S_PER_ROW
    gather_bytes = lanes * k * 4 / HBM_BYTES_PER_S
    gram_flops = lanes * (k * k + k) * 2
    gram_mxu = gram_flops / MXU_F32EQ_FLOPS
    gj_bytes = slots * (k * (k + 1) + k) * 4
    gj_flops = slots * k * k * (k + 1) * 2
    gj = max(gj_bytes / HBM_BYTES_PER_S, gj_flops / VPU_F32_FLOPS)
    factor_io = 2 * slots * k * 4 / HBM_BYTES_PER_S
    return {
        "lanes_padded": int(lanes),
        "slots": int(slots),
        "gather_issue_ms": round(gather_issue * 1e3, 2),
        "gather_bytes_ms": round(gather_bytes * 1e3, 2),
        "gram_mxu_ms": round(gram_mxu * 1e3, 2),
        "gj_solve_ms": round(gj * 1e3, 2),
        "factor_io_ms": round(factor_io * 1e3, 2),
        "floor_ms": round((max(gather_issue, gather_bytes) + gram_mxu + gj
                           + factor_io) * 1e3, 2),
    }


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
    m, n, nnz = 138_493, 26_744, 20_000_000
    R, _ = synthetic_cached(m, n, nnz, seed=3, test_fraction=0.02)
    cfg = Config(solver="als", k=k)
    ell = build_ell_pair(R, min_width=cfg.als_min_width, num_shards=1)
    tr = side_terms(ell.rows_side, k)
    tc = side_terms(ell.cols_side, k)
    out = {
        "workload": f"ALS ELL one Gauss-Seidel iteration, ml20M dims "
                    f"({m}x{n}, nnz={nnz}), k={k}, precision HIGHEST",
        "constants": {
            "gather_s_per_row": GATHER_S_PER_ROW,
            "hbm_bytes_per_s": HBM_BYTES_PER_S,
            "mxu_f32eq_flops": MXU_F32EQ_FLOPS,
            "vpu_f32_flops": VPU_F32_FLOPS,
        },
        "rows_side": tr,
        "cols_side": tc,
        "floor_iter_s": round((tr["floor_ms"] + tc["floor_ms"]) / 1e3, 4),
    }
    if "--measure" in sys.argv:
        import time

        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        import jax.numpy as jnp
        from cuda_recommender_tpu.core.init import init_factors_np
        from cuda_recommender_tpu.solvers.als_ell import make_als_outer_step
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
        W, H = jnp.asarray(W_s), jnp.asarray(H_s)
        nnz_r = jnp.asarray(rows.slot_nnz)
        nnz_c = jnp.asarray(cols.slot_nnz)
        step = make_als_outer_step(ell, 0.05, cfg.ell_chunk,
                                   precision_name="highest", solver="gj")
        W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)
        _ = np.asarray(W).sum()
        # group-difference timing (bench.py methodology)
        def grp(g, W, H):
            t0 = time.perf_counter()
            for _ in range(g):
                W, H = step(idx_r, idx_c, vals_r, vals_c, W, H,
                            nnz_r, nnz_c)
            _ = np.asarray(W).sum()
            return time.perf_counter() - t0, W, H
        t1s, tgs, G = [], [], 8
        for _ in range(3):
            d1, W, H = grp(1, W, H)
            dg, W, H = grp(G, W, H)
            t1s.append(d1)
            tgs.append(dg)
        dt = (float(np.median(tgs)) - float(np.median(t1s))) / (G - 1)
        out["measured_iter_s"] = round(dt, 4)
        out["measured_vs_floor"] = round(dt / out["floor_iter_s"], 3)
        out["device"] = jax.default_backend()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
