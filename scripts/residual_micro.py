"""Isolate why residual_update costs ~10 ms/call (~200x its HBM traffic).

tail_micro.py measured: sweeps+paired gathers for BOTH sides = 7 ms/rank,
but adding 3 residual_update calls costs +31 ms/rank. Each call is
elementwise (val += sign * gathered * own_broadcast) over ~3M elements
(~36 MB traffic = 44 us at spec) — something in the lowering is 100x off.

Variants (each: k=40 fori_loop, one jitted program, value-dependent carry):
  E  one residual_update (cols side) exactly as production
  F  same but own broadcast replaced by a scalar (no slots_to_lanes)
  G  same but gathered tiles replaced by val_tiles (no gather liveness)
  H  slots_to_lanes broadcast alone (is the odd-shape broadcast the cost?)
  I  pure elementwise val += s*val over the same tuples (floor)

Usage: python scripts/residual_micro.py [k=40]
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
    _bslice, extend_zero, paired_gather, residual_update, slots_to_lanes)
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
    cols = plan.ell.cols_side

    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)

    def islots(x):
        return jnp.concatenate([x, jnp.zeros(1, x.dtype)])[ipos_safe]

    def make(mode):
        @jax.jit
        def prog(v, vals_c):
            def body(t, carry):
                v, vals_c = carry
                if mode in ("E", "F", "G"):
                    pc = (paired_gather(extend_zero(jnp.stack([v, v], -1)),
                                        idx_c) if mode != "G" else None)
                    if mode == "E":
                        vals_c = residual_update(
                            idx_c, vals_c, cols, None, islots(v), -1.0,
                            gathered=[p[0] for p in pc])
                    elif mode == "F":
                        vals_c = tuple(
                            val + jnp.float32(-1.0) * og * v[0]
                            for val, og in zip(vals_c,
                                               [p[0] for p in pc]))
                    else:                     # G: no gather in the program
                        vals_c = residual_update(
                            idx_c, vals_c, cols, None, islots(v), -1.0,
                            gathered=list(vals_c))
                elif mode == "H":
                    ob = [slots_to_lanes(_bslice(islots(v), cols, i), b)
                          for i, b in enumerate(cols.buckets)]
                    vals_c = tuple(val + 1e-20 * o
                                   for val, o in zip(vals_c, ob))
                else:                         # I: elementwise floor
                    vals_c = tuple(val + jnp.float32(1e-20) * val
                                   for val in vals_c)
                v = v + 1e-12 * vals_c[0][0, 0]
                return v, vals_c

            return jax.lax.fori_loop(0, k, body, (v, vals_c))
        return prog

    v0 = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)
    out = {"k": k}
    for mode in ["E", "F", "G", "H", "I"]:
        prog = make(mode)
        t0 = time.perf_counter()
        r = prog(v0, vals_c)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(v0, vals_c)
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
