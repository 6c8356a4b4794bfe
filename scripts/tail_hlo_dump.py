"""Dump optimized HLO for the fast (A: gather+sweeps) and slow (C: +updates
reusing tiles) tail shapes to attribute the 33 ms/rank gap structurally
(results/tail_barrier_micro: optimization_barrier does NOT remove it, so
the round-3 remat-per-consumer story is incomplete).

Usage: XLA_FLAGS="--xla_dump_to=/tmp/xdump_<mode> --xla_dump_hlo_as_text" \
       python scripts/tail_hlo_dump.py <A|C> [k=2]
Compiles only (tiny k), no timing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.core.config import Config              # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import (                   # noqa: E402
    _bslice, extend_zero, lanes_to_slots, paired_gather, slots_to_lanes,
    stacked_remap)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402


def main():
    mode = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    m, n, nnz, cells = 480_189, 17_770, 100_000_000, 6_500_000_000
    R, _ = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=0.05, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=cells, hybrid_panel_widths=(4096, 2048))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_c0 = tuple(jnp.asarray(b.val) for b in cols.buckets)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(m) * 1e-3, jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n) * 1e-3, jnp.float32)

    def side_sweep(pcs, vals, side, col):
        gs, hs = [], []
        for i, b in enumerate(side.buckets):
            sw = pcs[i][col]
            gs.append(lanes_to_slots(sw * vals[i], b))
            hs.append(lanes_to_slots(sw * sw, b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return jnp.concatenate(gs + zt), jnp.concatenate(hs + zt)

    @jax.jit
    def prog(u, v, vals_c):
        def body(t, carry):
            u, v, vals_c = carry
            s = 1e-9 * (t + 1).astype(jnp.float32)
            up, vo = u * s, v * s
            pc = paired_gather(extend_zero(jnp.stack([up, u], -1)), idx_c)
            if mode == "C":
                ovp, ovo = stacked_remap((vo, v), ipos_safe)
                nv = []
                for i, b in enumerate(cols.buckets):
                    x = vals_c[i]
                    x = x + jnp.float32(-1e-6) * pc[i][0] * slots_to_lanes(
                        _bslice(ovp, cols, i), b)
                    x = x + jnp.float32(1e-6) * pc[i][1] * slots_to_lanes(
                        _bslice(ovo, cols, i), b)
                    nv.append(x)
                vals_c = tuple(nv)
            g, h = side_sweep(pc, vals_c, cols, 1)
            v = v + 1e-12 * g[:8].sum()
            u = u + 1e-12 * h[:8].sum()
            return u, v, vals_c
        return jax.lax.fori_loop(0, k, body, (u, v, vals_c))

    lowered = prog.lower(u0, v0, vals_c0)
    compiled = lowered.compile()
    path = f"/tmp/tail_hlo_{mode}.txt"
    with open(path, "w") as f:
        f.write(compiled.as_text())
    print("compiled ok;", mode, "->", path)


if __name__ == "__main__":
    main()
