"""Microbench the hybrid ELL-tail ops at the headline plan's exact shapes.

The decomposition run (scripts/decompose_hybrid_tpu.py) measured the tail at
~91 ms/rank while the gather model (3.3 ns/row paired + 7.7 ns/elem 1-wide)
predicts ~35 ms/rank. This times the tail's constituent op groups in
isolation — each as ONE jitted program that runs the op k=40 times in a
fori_loop with a value dependency (so XLA cannot DCE or overlap across
"ranks") — to find which op group carries the unexplained ~56 ms/rank.

  A  paired_gather(cols) + sweep_partials(cols)      [the v-sweep tail]
  B  A + paired_gather(rows) + sweep_partials(rows)  [+ the u-sweep tail]
  C  B + 3x residual_update                          [+ residual maintenance]
  D  C + slot<->entity remap gathers                 [the full tail ladder]

Usage: python scripts/tail_micro.py [k=40]
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
    extend_zero, paired_gather, residual_update, sweep_partials)
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
    sou = jnp.asarray(plan.slot_of_upos)
    soi = jnp.asarray(plan.slot_of_ipos)

    def uslots(x):
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[upos_safe]

    def islots(x):
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[ipos_safe]

    def make(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                pc = paired_gather(extend_zero(jnp.stack([u, u], -1)), idx_c)
                g, h, _ = sweep_partials(idx_c, vals_c, cols, None,
                                         gathered=[p[0] for p in pc])
                if mode >= 1:
                    pr = paired_gather(extend_zero(jnp.stack([v, v], -1)),
                                       idx_r)
                    gr, hr, _ = sweep_partials(idx_r, vals_r, rows, None,
                                               gathered=[p[0] for p in pr])
                else:
                    pr = None
                    gr = jnp.zeros(rows.n_slots, jnp.float32)
                    hr = gr
                if mode >= 2:
                    vals_c = residual_update(idx_c, vals_c, cols, None,
                                             islots(v), -1.0,
                                             gathered=[p[0] for p in pc])
                    vals_c = residual_update(idx_c, vals_c, cols, None,
                                             islots(v), +1.0,
                                             gathered=[p[1] for p in pc])
                    vals_r = residual_update(idx_r, vals_r, rows, None,
                                             uslots(u), -1.0,
                                             gathered=[p[0] for p in pr])
                if mode >= 3:
                    # slot->entity remaps, shape-faithful to production:
                    # gather from the FULL n_slots-sized partial arrays with
                    # the (m,)/(n,)-sized slot maps, exactly as
                    # ccd_hybrid.py's `g_lr[slot_of_upos]` / `g_l[soi]` do
                    u = u + 1e-12 * (gr[sou] / (1.0 + hr[sou]))
                    v = v + 1e-12 * (g[soi] + h[soi])
                else:
                    u = u + 1e-12 * jnp.sum(gr[:8]) + 1e-12 * jnp.sum(g[:8])
                    v = v + 1e-12 * jnp.sum(hr[:8]) + 1e-12 * jnp.sum(h[:8])
                return u, v, vals_r, vals_c

            return jax.lax.fori_loop(0, k, body, (u, v, vals_r, vals_c))
        return prog

    u0 = jnp.asarray(np.random.default_rng(0).standard_normal(m), jnp.float32)
    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)

    out = {"k": k}
    for mode, name in [(0, "A_cols_sweep"), (1, "B_plus_rows_sweep"),
                       (2, "C_plus_residual_updates"), (3, "D_plus_remaps")]:
        prog = make(mode)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r, vals_c)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r, vals_c)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[name] = {"total_s": round(dt, 4),
                     "per_rank_ms": round(dt / k * 1e3, 2),
                     "compile_s": round(compile_s, 1)}
        print(f"{name}: {dt:.3f} s = {dt/k*1e3:.2f} ms/rank "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
