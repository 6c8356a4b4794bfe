"""Validate the sharded hybrid step's COLLECTIVE schedule on the virtual
CPU mesh (VERDICT r4 next #8).

Real multi-chip hardware is unreachable here, and wall-clock on a virtual
mesh is meaningless (all "devices" share the host cores), so the
measurable scaling evidence is structural: compile the PRODUCTION
make_sharded_hybrid_step at N in {1, 2, 4, 8} and count the collectives
in the optimized HLO. The design claim (parallel/ccd_hybrid_sharded.py):
exactly ONE fused psum per half-sweep — 2 all-reduces per rank, sitting
in the fori_loop body, payload 2(n+m) f32 per rank, independent of N.
If XLA inserted extra collectives (e.g. resharding the replicated factor
tables or the pend vectors), this script would catch it.

The analytic ICI model (scripts/scaling_model.py) consumes this schedule;
its r5 re-anchoring uses the measured panel/tail walls
(results/panel_floor_r5.json, tail_floor_r4.json).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_collectives.py
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic       # noqa: E402
from cuda_recommender_tpu.parallel.ccd_hybrid_sharded import (  # noqa: E402
    make_sharded_hybrid_step)
from cuda_recommender_tpu.parallel.mesh import AXIS, make_mesh  # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import (  # noqa: E402
    densify_panels, plan_hybrid)

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def count_collectives(hlo: str) -> dict:
    out = {}
    for c in COLLECTIVES:
        # count op APPLICATIONS ("all-reduce(", "all-reduce-start(") — the
        # defining line's type can be a tuple with spaces, so match the
        # call site, not "= <type> <op>"
        out[c] = len(re.findall(rf"\b{re.escape(c)}(?:-start)?\(", hlo))
    return out


def main():
    m, n, nnz, k = 4096, 512, 120_000, 6
    R, T = synthetic(m=m, n=n, nnz=nnz, seed=3, test_fraction=0.02)
    cfg = Config(k=k, lambda_=0.1, backend="hybrid", mask_dtype="nan",
                 hybrid_dense_cells=200 * n, hybrid_panel_widths=(128,))
    W0, _ = init_factors_np(k, m, n, seed=0)

    devs = jax.devices()
    rows = []
    for N in (1, 2, 4, 8):
        mesh = make_mesh(devs[:N])
        plan = plan_hybrid(R, cfg, num_shards=N, materialize_dense=False)
        rows_g, cols_g = plan.ell.rows_side, plan.ell.cols_side
        shard = NamedSharding(mesh, P(AXIS, None))
        svec = NamedSharding(mesh, P(AXIS))
        rep = NamedSharding(mesh, P())
        idx_r = tuple(jax.device_put(b.idx, shard) for b in rows_g.buckets)
        idx_c = tuple(jax.device_put(b.idx, shard) for b in cols_g.buckets)
        Rds, masks = densify_panels(plan, jnp.float32, sharding=shard,
                                    mask_dtype="nan", num_shards=N)
        vals_r = tuple(jax.device_put(b.val, shard) for b in rows_g.buckets)
        vals_c = tuple(jax.device_put(b.val, shard) for b in cols_g.buckets)
        W = jax.device_put(np.asarray(W0, np.float32)[:, plan.user_order],
                           rep)
        H = jax.device_put(np.zeros((k, n), np.float32), rep)
        u_pend = jax.device_put(np.zeros(m, np.float32), rep)
        v_pend = jax.device_put(np.zeros(n, np.float32), rep)
        row_nnz = jax.device_put(plan.row_nnz, rep)
        col_nnz = jax.device_put(plan.col_nnz, rep)
        eosr = jax.device_put(plan.upos_of_slot_safe, svec)
        eosi = jax.device_put(plan.ipos_of_slot_safe, svec)

        def local_map(slot_of_pos, slots_per_shard, n_ent):
            out = np.full((N, n_ent), slots_per_shard, np.int32)
            owner = slot_of_pos // slots_per_shard
            local = slot_of_pos % slots_per_shard
            out[owner, np.arange(n_ent)] = local
            return out

        lsu = jax.device_put(local_map(plan.slot_of_upos.astype(np.int64),
                                       rows_g.slots_per_shard, m), shard)
        lsi = jax.device_put(local_map(plan.slot_of_ipos.astype(np.int64),
                                       cols_g.slots_per_shard, n), shard)
        step = make_sharded_hybrid_step(plan, mesh, cfg.lambda_, 1,
                                        nan_mask=True)
        args = (idx_r, idx_c, Rds, masks, vals_r, vals_c, W, H,
                u_pend, v_pend, row_nnz, col_nnz, lsu, lsi, eosr, eosi)
        lowered = step.lower(*args)
        hlo = lowered.compile().as_text()
        counts = count_collectives(hlo)
        # functional check: the compiled step actually runs on this mesh
        out = step(*args)
        _ = np.asarray(out[6] if len(out) > 6 else out[3]).sum()
        per_rank_payload_B = 2 * 4 * (m + n)
        rows.append({"n_devices": N, "collectives_static": counts,
                     "expected": "2 fused psums per rank inside the rank "
                                 "loop (one per half-sweep), count "
                                 "independent of N",
                     "per_rank_psum_payload_B": per_rank_payload_B})
        print(json.dumps(rows[-1]), flush=True)

    # invariant: the static collective count must not grow with N (the
    # schedule is the SAME program; only the mesh size changes). N=1 keeps
    # its 2 single-participant all-reduces — shard_map does not specialize
    # them away, which is fine (they are no-op moves at N=1)
    c1 = sum(rows[0]["collectives_static"].values())
    cN = [sum(r["collectives_static"].values()) for r in rows[1:]]
    rec = {"workload": "sharded hybrid step collective-schedule validation "
                       "(virtual CPU mesh, compiled HLO op census)",
           "dims": {"m": m, "n": n, "nnz": int(R.nnz), "k": k},
           "rows": rows,
           "invariant_count_flat_in_N": bool(len(set(cN)) <= 1),
           "n1_collectives": c1,
           "script": "scripts/scaling_collectives.py"}
    with open("results/scaling_collectives_r5.json", "w") as f:
        json.dump(rec, f, indent=1)
    print("RESULT " + json.dumps({"n1": c1, "nN": cN,
                                  "flat": rec["invariant_count_flat_in_N"]}),
          flush=True)


if __name__ == "__main__":
    main()
