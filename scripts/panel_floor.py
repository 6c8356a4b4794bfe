"""Panel-side floor attribution for the headline hybrid iteration (r5).

VERDICT r4 missing #1: against the composite model (6 B/cell/rank @ 819
GB/s spec = 1.90 s/iter for the 6.48e9-cell stair) the measured
panels-only time (2.417 s/iter, results/hybrid_decomposition_r3b.json)
leaves ~0.5 s/iter of panel-side excess with no attribution artifact.
This script measures, at the REAL headline panel shapes (block-padded
(330240, 18432) + (150528, 4096) bf16):

  rmw_cm   control: pure read+write stream, same block shape and
           column-of-blocks grid order as panel_update_vsweep, no dots,
           no vectors — the ACHIEVABLE RMW rate for this access pattern.
  rmw_rm   same, row-of-blocks (contiguous) grid order — isolates the
           grid-order term.
  read_cm  control: pure read + (1, bw) column-sum accumulation, the
           vsweep access pattern without the MXU contractions.
  uv       the real fused panel_update_vsweep kernel (4 B/cell).
  us       the real panel_usweep kernel (2 B/cell).

DCE discipline (results/tail_floor_r4.json, MEMORY dce-contaminated-
micros): every mode runs under ONE jit as a lax.fori_loop with a DYNAMIC
trip count. RMW modes chain the residual through the carry; read-only
modes feed the accumulated scalar back into the kernel's VECTOR input
(an Mp/Wp-sized op, not a panel-sized one) so the body cannot be hoisted
out of the loop. The fence reads back an 18 MB slice that depends on the
final carry. Group-difference timing throughout: per-call =
(median T_n - median T_1) / (n - 1). The big state is donated so only
one panel copy lives in HBM.

Usage: python scripts/panel_floor.py [out=results/panel_floor_r5.json]
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
from jax.experimental import pallas as pl  # noqa: E402

from cuda_recommender_tpu.ops.panel_pallas import (  # noqa: E402
    BM, BW, panel_update_vsweep, panel_usweep)

HBM_SPEC = 819e9

# headline stair (BENCH_r04 panels), block-padded to (BM, BW)
P1 = (330240, 18432)        # 330128 x 17770 panel
P2 = (150528, 4096)         # 150061 x 4096 panel
if os.environ.get("CRTPU_PF_SMALL"):     # compile/logic smoke at tiny shapes
    P1, P2 = (2048, 4096), (1024, 2048)


def _rmw_kernel(Rd_ref, Rout_ref):
    Rout_ref[...] = Rd_ref[...] + jnp.bfloat16(1.0)


def _read_kernel(Rd_ref, u_ref, g_ref):
    im = pl.program_id(1)
    s = jnp.sum(Rd_ref[...].astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(im == 0)
    def _init():
        g_ref[...] = jnp.zeros_like(g_ref)

    g_ref[...] += s * u_ref[0, 0]


def rmw_call(Rd, *, rowmajor: bool):
    Mp, Wp = Rd.shape
    if rowmajor:
        grid = (Mp // BM, Wp // BW)
        spec = pl.BlockSpec((BM, BW), lambda im, jw: (im, jw))
    else:
        grid = (Wp // BW, Mp // BM)
        spec = pl.BlockSpec((BM, BW), lambda jw, im: (im, jw))
    return pl.pallas_call(
        _rmw_kernel, grid=grid, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Mp, Wp), Rd.dtype),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=Mp * Wp, bytes_accessed=2 * Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
    )(Rd)


def read_call(Rd, u_row):
    """u_row (1, Mp) f32 — same vector plumbing as the vsweep kernel."""
    Mp, Wp = Rd.shape
    grid = (Wp // BW, Mp // BM)
    return pl.pallas_call(
        _read_kernel, grid=grid,
        in_specs=[pl.BlockSpec((BM, BW), lambda jw, im: (im, jw)),
                  pl.BlockSpec((1, BM), lambda jw, im: (0, im))],
        out_specs=pl.BlockSpec((1, BW), lambda jw, im: (0, jw)),
        out_shape=jax.ShapeDtypeStruct((1, Wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Mp * Wp, bytes_accessed=Mp * Wp * Rd.dtype.itemsize,
            transcendentals=0),
    )(Rd, u_row)


def time_mode(fn, state, bytes_per_call, n_group, reps=4):
    """fn: (state, n) -> (state, token); token ~18 MB, depends on the final
    carry. Returns (record, final_state). fn must donate `state`."""
    t0 = time.perf_counter()
    state, tok = fn(state, 1)
    _ = np.asarray(tok).sum()
    compile_s = time.perf_counter() - t0
    state, tok = fn(state, 1)
    _ = np.asarray(tok).sum()

    def grp(n, state):
        t0 = time.perf_counter()
        state, tok = fn(state, n)
        _ = np.asarray(tok).sum()
        return time.perf_counter() - t0, state

    t1s, tgs = [], []
    for _ in range(reps):
        d1, state = grp(1, state)
        dg, state = grp(n_group, state)
        t1s.append(d1)
        tgs.append(dg)
    per_call = ((float(np.median(tgs)) - float(np.median(t1s)))
                / (n_group - 1))
    gbps = bytes_per_call / per_call / 1e9
    return {"per_call_ms": round(per_call * 1e3, 2),
            "achieved_GB_s": round(gbps, 1),
            "pct_of_spec": round(100 * gbps * 1e9 / HBM_SPEC, 1),
            "bytes_per_call_GB": round(bytes_per_call / 1e9, 2),
            "n_group": n_group, "compile_s": round(compile_s, 1),
            "t1_samples_s": [round(x, 3) for x in t1s],
            "tg_samples_s": [round(x, 3) for x in tgs]}, state


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "results/panel_floor_r5.json"
    rng = np.random.default_rng(0)
    out = {"workload": "panel kernel vs stream-control floors at the "
                       "headline stair shapes, bf16",
           "panels": {"p1": list(P1), "p2": list(P2)},
           "block": [BM, BW], "hbm_spec_GB_s": HBM_SPEC / 1e9,
           "method": "ONE jit per mode, lax.fori_loop with dynamic trip "
                     "count, full-size carry / vector-feedback (DCE-proof),"
                     " 18 MB dependent readback fence, donated state, "
                     "group-difference timing"}

    for pname, (Mp, Wp) in (("p1", P1), ("p2", P2)):
        # DEVICE-side panel synthesis: a host-side 6e9-element normal would
        # cost ~49 GB of host RAM and a 24 GB tunnel transfer; kernel cost
        # is value-independent, so generate on-chip
        Rd0 = jax.jit(
            lambda key, s=(Mp, Wp): (jax.random.normal(key, s, jnp.float32)
                                     * 1e-3).astype(jnp.bfloat16)
        )(jax.random.key(0))
        u = jnp.asarray(rng.standard_normal(Mp) * 1e-3, jnp.float32)
        v = jnp.asarray(rng.standard_normal(Wp) * 1e-3, jnp.float32)
        cells = Mp * Wp
        ng_ctl, ng_k = (96, 48) if pname == "p1" else (None, 384)
        res = {}

        def token(Rd, acc):
            return (Rd[:256].astype(jnp.float32)
                    * (1.0 + acc * jnp.float32(1e-30)))

        state = (Rd0, jnp.float32(0))
        del Rd0

        if pname == "p1":
            # --- RMW controls ---
            for mode, rm in (("rmw_cm", False), ("rmw_rm", True)):
                def run_rmw(st, n, rm=rm):
                    Rd, acc = st
                    Rd = jax.lax.fori_loop(
                        0, n, lambda i, R: rmw_call(R, rowmajor=rm), Rd)
                    return (Rd, acc), token(Rd, acc)

                r, state = time_mode(jax.jit(run_rmw, donate_argnums=(0,)),
                                     state, 4 * cells, ng_ctl)
                res[mode] = r
                print(f"{pname} {mode}: {r}", flush=True)

            # --- read control (vsweep access pattern, no MXU work) ---
            def run_read(st, n):
                Rd, acc = st

                def body(i, acc):
                    ur = jnp.pad(u, (0, 0))[None, :] + acc * 1e-30
                    g = read_call(Rd, ur)
                    return g.sum()

                acc = jax.lax.fori_loop(0, n, body, acc)
                return (Rd, acc), token(Rd, acc)

            r, state = time_mode(jax.jit(run_read, donate_argnums=(0,)),
                                 state, 2 * cells, ng_ctl)
            res["read_cm"] = r
            print(f"{pname} read_cm: {r}", flush=True)

        # --- the real kernels ---
        def run_uv(st, n):
            Rd, acc = st

            def body(i, st):
                Rd, acc = st
                eps = acc * jnp.float32(1e-30)
                Rd, g, h = panel_update_vsweep(Rd, u + eps, u, v, v)
                return (Rd, g.sum() + h.sum())

            Rd, acc = jax.lax.fori_loop(0, n, body, (Rd, acc))
            return (Rd, acc), token(Rd, acc)

        r, state = time_mode(jax.jit(run_uv, donate_argnums=(0,)),
                             state, 4 * cells, ng_k)
        res["uv"] = r
        print(f"{pname} uv: {r}", flush=True)

        def run_us(st, n):
            Rd, acc = st

            def body(i, acc):
                g, h = panel_usweep(Rd, v + acc * jnp.float32(1e-30))
                return g.sum() + h.sum()

            acc = jax.lax.fori_loop(0, n, body, acc)
            return (Rd, acc), token(Rd, acc)

        r, state = time_mode(jax.jit(run_us, donate_argnums=(0,)),
                             state, 2 * cells, ng_k)
        res["us"] = r
        print(f"{pname} us: {r}", flush=True)

        out[pname] = res
        del state

    # implied per-rank and per-iter panel cost from the measured kernels
    k = 40
    per_rank_ms = sum(out[p][m]["per_call_ms"]
                      for p in ("p1", "p2") for m in ("uv", "us"))
    out["implied"] = {
        "k": k,
        "panel_ms_per_rank": round(per_rank_ms, 2),
        "panel_s_per_iter": round(per_rank_ms * k / 1e3, 3),
        "model_s_per_iter_spec": round(
            sum(6 * M * W for (M, W) in (P1, P2)) * k / HBM_SPEC, 3),
    }
    print("RESULT " + json.dumps(out["implied"]), flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
