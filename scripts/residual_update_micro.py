"""Isolate the ELL-tail residual_update pathology (tail_micro r3 found the
3 residual updates add ~33 ms/rank while the 4 gathers+sweeps cost 5.4 ms
and the pure HBM RMW traffic models at ~0.1 ms/update).

Variants, each ONE jitted program running the op k times in a fori_loop
with value dependencies (no DCE / cross-rank overlap):

  G   paired gathers + sweeps only (tail_micro mode B re-run as control)
  U2  G + ONE residual_update per side REUSING the gathered tiles
      (production's reuse pattern, 2 updates instead of 3)
  UC  G + the same 2 updates but consuming CONSTANT pre-materialized
      gathered tiles (reuse broken on purpose) — if UC is fast and U2 slow,
      the cost is the gather-output REUSE forcing a rematerialization, not
      the update op
  E   elementwise-only control: val += s * og_const * ob_const with fully
      precomputed operands — the pure RMW floor, no gathers, no
      slots_to_lanes, no slot-vector gathers

Usage: python scripts/residual_update_micro.py [k=40]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                                          # noqa: E402

from cuda_recommender_tpu.core.config import Config              # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import (                   # noqa: E402
    extend_zero, paired_gather, residual_update, slots_to_lanes,
    sweep_partials)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    m, n = 480_189, 17_770
    R, _ = synthetic_cached(m, n, 100_000_000, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=0.05, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=6_500_000_000,
                 hybrid_panel_widths=(4096, 2048))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    upos_safe = jnp.asarray(plan.upos_of_slot_safe)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)

    def uslots(x):
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[upos_safe]

    def islots(x):
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[ipos_safe]

    # pre-materialized gather outputs + lane-broadcast own vectors for UC/E
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(m), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    og_c_const = tuple(jnp.asarray(rng.standard_normal(ix.shape),
                                   jnp.float32) for ix in idx_c)
    og_r_const = tuple(jnp.asarray(rng.standard_normal(ix.shape),
                                   jnp.float32) for ix in idx_r)
    ob_c_const = tuple(jnp.asarray(rng.standard_normal(ix.shape),
                                   jnp.float32) for ix in idx_c)
    ob_r_const = tuple(jnp.asarray(rng.standard_normal(ix.shape),
                                   jnp.float32) for ix in idx_r)

    def make(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                if mode == "E":
                    s = 1e-12 * (t + 1).astype(jnp.float32)
                    vals_c = tuple(vc + s * og * ob for vc, og, ob in
                                   zip(vals_c, og_c_const, ob_c_const))
                    vals_r = tuple(vr + s * og * ob for vr, og, ob in
                                   zip(vals_r, og_r_const, ob_r_const))
                    u = u + 1e-12 * vals_r[0][0, :1].sum()
                    v = v + 1e-12 * vals_c[0][0, :1].sum()
                    return u, v, vals_r, vals_c
                pc = paired_gather(extend_zero(jnp.stack([u, u], -1)), idx_c)
                g, h, _ = sweep_partials(idx_c, vals_c, cols, None,
                                         gathered=[p[0] for p in pc])
                pr = paired_gather(extend_zero(jnp.stack([v, v], -1)), idx_r)
                gr, hr, _ = sweep_partials(idx_r, vals_r, rows, None,
                                           gathered=[p[0] for p in pr])
                if mode == "U2":
                    vals_c = residual_update(idx_c, vals_c, cols, None,
                                             islots(v), 1e-12,
                                             gathered=[p[0] for p in pc])
                    vals_r = residual_update(idx_r, vals_r, rows, None,
                                             uslots(u), 1e-12,
                                             gathered=[p[0] for p in pr])
                elif mode == "UC":
                    vals_c = residual_update(idx_c, vals_c, cols, None,
                                             islots(v), 1e-12,
                                             gathered=list(og_c_const))
                    vals_r = residual_update(idx_r, vals_r, rows, None,
                                             uslots(u), 1e-12,
                                             gathered=list(og_r_const))
                u = u + 1e-12 * (jnp.sum(gr[:8]) + jnp.sum(g[:8]))
                v = v + 1e-12 * (jnp.sum(hr[:8]) + jnp.sum(h[:8]))
                return u, v, vals_r, vals_c

            return jax.lax.fori_loop(0, k, body, (u, v, vals_r, vals_c))
        return prog

    out = {"k": k}
    for mode in ["G", "U2", "UC", "E"]:
        prog = make(mode)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r, vals_c)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r, vals_c)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[mode] = {"total_s": round(dt, 4),
                     "per_rank_ms": round(dt / k * 1e3, 2),
                     "compile_s": round(compile_s, 1)}
        print(f"{mode}: {dt:.3f} s = {dt/k*1e3:.2f} ms/rank "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
