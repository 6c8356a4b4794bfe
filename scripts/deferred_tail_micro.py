"""Attribute and optimize the PRODUCTION-shaped rank-deferred tail.

The component micros (results/tail_attribution_r4.json) projected
~16 ms/rank for the deferred design, but the first production wiring
measured tail_only at ~54 ms/rank — the gap has to be in what the
component micros left out: the 4 narrow per-rank stacked_remaps, the
slot-space correction combination, the lax.cond flush, and the
dynamic_update_slice table writes. (Mode D2R already showed remaps can
cost 40+ ms/rank in the wrong fusion context.)

Modes, each ONE jitted program, k ranks in fori_loop, no panels:

  RW<T>  wide stacked_remap scaling control: remap T slot vectors
         slot->entity in ONE (S, T) row-gather pass, consumed by one sum
  PD     the round-4 production wiring as first implemented: per-rank owns
         remaps (2 narrow) + deferred_sweep + slot-space combination +
         narrow output remap (1x2-wide) + cond flush every G
  PDW    the improved wiring: NO owns remaps — deferred_sweep outputs
         [S0, Sc..., h] remapped slot->entity in ONE wide pass, correction
         combined in ENTITY space against the resident U_def/V_def
         columns; flush owns remapped once per group (wide), cond flush
  PDWN   PDW without the flush (lower bound: sweeps + wide remaps only)

Usage: python scripts/deferred_tail_micro.py [k=40] [G=8]

DCE WARNING (results/tail_floor_r4.json): modes in this script that consume
reduction outputs through [:8]-style SLICES are partially dead-code-
eliminated by XLA (slicing through the concatenated per-bucket outputs
drops every bucket but the first) and their absolute numbers UNDERSTATE
the true cost by up to 10x. Only modes that carry and return the values
arrays, or whose outputs pass through a lax.map, measure full work. Kept
as-is for the historical record — do not re-trust sliced-consumer numbers.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if os.environ.get("CRTPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                                          # noqa: E402

from cuda_recommender_tpu.core.config import Config              # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.ops.ell_ops import (                   # noqa: E402
    deferred_flush, deferred_sweep, extend_zero, fused_remap_combine,
    stacked_remap)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if os.environ.get("CRTPU_BENCH_CPU"):
        m, n, nnz, cells, k = 1_900, 450, 120_000, 9_000, 6
    else:
        m, n, nnz, cells = 480_189, 17_770, 100_000_000, 6_500_000_000
    R, _ = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=0.05, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=cells,
                 hybrid_panel_widths=(4096, 2048) if n > 4096 else (64,))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r0 = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c0 = tuple(jnp.asarray(b.val) for b in cols.buckets)
    upos_safe = jnp.asarray(plan.upos_of_slot_safe)
    ipos_safe = jnp.asarray(plan.ipos_of_slot_safe)
    slot_of_upos = jnp.asarray(plan.slot_of_upos)
    slot_of_ipos = jnp.asarray(plan.slot_of_ipos)
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal(m) * 1e-3, jnp.float32)
    v0 = jnp.asarray(rng.standard_normal(n) * 1e-3, jnp.float32)
    dsigns = tuple((-1.0 if c % 2 == 0 else 1.0) for c in range(2 * G))
    f32 = jnp.float32

    def make_rw(T):
        vecs = [jnp.asarray(rng.standard_normal(cols.n_slots) * 1e-3, f32)
                for _ in range(T)]
        vecs_r = [jnp.asarray(rng.standard_normal(rows.n_slots) * 1e-3, f32)
                  for _ in range(T)]

        @jax.jit
        def prog(u, v):
            def body(t, carry):
                u, v = carry
                s = 1e-9 * (t + 1).astype(f32)
                outs = stacked_remap([x * s for x in vecs], slot_of_ipos)
                outs_r = stacked_remap([x * s for x in vecs_r],
                                       slot_of_upos)
                u = u + 1e-12 * sum(o[:8].sum() for o in outs_r)
                v = v + 1e-12 * sum(o[:8].sum() for o in outs)
                return u, v
            return jax.lax.fori_loop(0, k, body, (u, v))
        return prog

    def make_frc():
        """fused_remap_combine isolated: 2G+2 slot vectors remapped +
        combined per side per rank, nothing else."""
        svec_c = [jnp.asarray(rng.standard_normal(cols.n_slots) * 1e-3, f32)
                  for _ in range(2 * G + 1)]
        hvec_c = jnp.asarray(rng.standard_normal(cols.n_slots) * 1e-3, f32)
        svec_r = [jnp.asarray(rng.standard_normal(rows.n_slots) * 1e-3, f32)
                  for _ in range(2 * G + 1)]
        hvec_r = jnp.asarray(rng.standard_normal(rows.n_slots) * 1e-3, f32)
        Vt = jnp.asarray(rng.standard_normal((2 * G, n)) * 1e-3, f32)
        Ut = jnp.asarray(rng.standard_normal((2 * G, m)) * 1e-3, f32)

        @jax.jit
        def prog(u, v):
            def body(t, carry):
                u, v = carry
                s = 1e-9 * (t + 1).astype(f32)
                ge, he = fused_remap_combine(
                    [x * s for x in svec_c], hvec_c, slot_of_ipos, Vt,
                    dsigns)
                gre, hre = fused_remap_combine(
                    [x * s for x in svec_r], hvec_r, slot_of_upos, Ut,
                    dsigns)
                u = u + 1e-12 * gre[:8].sum() + 1e-15 * hre[:8].sum()
                v = v + 1e-12 * ge[:8].sum() + 1e-15 * he[:8].sum()
                return u, v
            return jax.lax.fori_loop(0, k, body, (u, v))
        return prog

    def make_pd(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                (u, v, vals_r, vals_c, U_def, V_def,
                 OV_def, OU_def) = carry
                s = 1e-9 * (t + 1).astype(f32)
                up, vo = u * s, v * s
                if mode == "PDSF":
                    # control: fresh-stacked tables like wide_sweep_micro
                    # (no carried buffer in the gather operand path)
                    tab_c = extend_zero(jnp.stack(
                        [u * (1.0 + s * j) for j in range(2 * G + 1)], -1))
                    tab_r = extend_zero(jnp.stack(
                        [v * (1.0 + s * j) for j in range(2 * G + 1)], -1))
                    S0, Sc, h_l = deferred_sweep(idx_c, vals_c, cols, tab_c)
                    S0r, Scr, h_lr = deferred_sweep(idx_r, vals_r, rows,
                                                    tab_r)
                    u = u + 1e-12 * S0r[:8].sum() + 1e-15 * h_lr[:8].sum()
                    v = v + 1e-12 * S0[:8].sum() + 1e-15 * h_l[:8].sum()
                    u = u + 1e-15 * sum(x[:4].sum() for x in Scr)
                    v = v + 1e-15 * sum(x[:4].sum() for x in Sc)
                    return (u, v, vals_r, vals_c, U_def, V_def, OV_def,
                            OU_def)
                jj = 2 * jnp.mod(t, G)
                U_def = jax.lax.dynamic_update_slice(
                    U_def, jnp.stack([up, u], -1), (0, jj))
                V_def = jax.lax.dynamic_update_slice(
                    V_def, jnp.stack([vo, v], -1), (0, jj))
                if mode == "PDS":
                    # carried dyn-updated tables, no remaps/flush/combine
                    tab_c = extend_zero(jnp.concatenate([u[:, None], U_def],
                                                        1))
                    tab_r = extend_zero(jnp.concatenate([v[:, None], V_def],
                                                        1))
                    S0, Sc, h_l = deferred_sweep(idx_c, vals_c, cols, tab_c)
                    S0r, Scr, h_lr = deferred_sweep(idx_r, vals_r, rows,
                                                    tab_r)
                    u = u + 1e-12 * S0r[:8].sum() + 1e-15 * h_lr[:8].sum()
                    v = v + 1e-12 * S0[:8].sum() + 1e-15 * h_l[:8].sum()
                    u = u + 1e-15 * sum(x[:4].sum() for x in Scr)
                    v = v + 1e-15 * sum(x[:4].sum() for x in Sc)
                    return (u, v, vals_r, vals_c, U_def, V_def, OV_def,
                            OU_def)
                if mode == "PD":
                    ovp, ovo = stacked_remap((vo, v), ipos_safe)
                    oup, ouo = stacked_remap((up, u), upos_safe)
                    OV_def = jax.lax.dynamic_update_slice(
                        OV_def, jnp.stack([ovp, ovo]), (jj, 0))
                    OU_def = jax.lax.dynamic_update_slice(
                        OU_def, jnp.stack([oup, ouo]), (jj, 0))
                # cols sweep
                tab_c = extend_zero(jnp.concatenate([u[:, None], U_def], 1))
                S0, Sc, h_l = deferred_sweep(idx_c, vals_c, cols, tab_c)
                tab_r = extend_zero(jnp.concatenate([v[:, None], V_def], 1))
                S0r, Scr, h_lr = deferred_sweep(idx_r, vals_r, rows, tab_r)
                if mode in ("PDF", "PDFN"):
                    # the round-4 production wiring: remap+combination in
                    # ONE fused chunked pass per side (fused_remap_combine)
                    ge, he = fused_remap_combine([S0] + Sc, h_l,
                                                 slot_of_ipos, V_def.T,
                                                 dsigns)
                    gre, hre = fused_remap_combine([S0r] + Scr, h_lr,
                                                   slot_of_upos, U_def.T,
                                                   dsigns)
                    u = u + 1e-12 * gre[:8].sum() + 1e-15 * hre[:8].sum()
                    v = v + 1e-12 * ge[:8].sum() + 1e-15 * he[:8].sum()
                    if mode == "PDF":
                        def do_flush(args):
                            vals_r, vals_c, U_def, V_def = args
                            OV = jnp.stack(stacked_remap(
                                [V_def[:, c] for c in range(2 * G)],
                                ipos_safe))
                            OU = jnp.stack(stacked_remap(
                                [U_def[:, c] for c in range(2 * G)],
                                upos_safe))
                            vals_c = deferred_flush(idx_c, vals_c, cols,
                                                    extend_zero(U_def), OV,
                                                    dsigns)
                            vals_r = deferred_flush(idx_r, vals_r, rows,
                                                    extend_zero(V_def), OU,
                                                    dsigns)
                            return (vals_r, vals_c, jnp.zeros_like(U_def),
                                    jnp.zeros_like(V_def))
                        pred = jnp.logical_or(jnp.mod(t, G) == G - 1,
                                              t == k - 1)
                        (vals_r, vals_c, U_def, V_def) = jax.lax.cond(
                            pred, do_flush, lambda a: a,
                            (vals_r, vals_c, U_def, V_def))
                    return (u, v, vals_r, vals_c, U_def, V_def, OV_def,
                            OU_def)
                if mode == "PD":
                    g_l = S0
                    g_lr = S0r
                    for c in range(2 * G):
                        g_l = g_l + f32(dsigns[c]) * OV_def[c] * Sc[c]
                        g_lr = g_lr + f32(dsigns[c]) * OU_def[c] * Scr[c]
                    ge, he = stacked_remap((g_l, h_l), slot_of_ipos)
                    gre, hre = stacked_remap((g_lr, h_lr), slot_of_upos)
                else:
                    # ONE wide remap of all reduction outputs, entity-space
                    # combination against the resident V_def/U_def columns
                    outs = stacked_remap([S0] + Sc + [h_l], slot_of_ipos)
                    outs_r = stacked_remap([S0r] + Scr + [h_lr],
                                           slot_of_upos)
                    ge, he = outs[0], outs[-1]
                    gre, hre = outs_r[0], outs_r[-1]
                    for c in range(2 * G):
                        ge = ge + f32(dsigns[c]) * V_def[:, c] * outs[c + 1]
                        gre = gre + f32(dsigns[c]) * U_def[:, c] * \
                            outs_r[c + 1]
                u = u + 1e-12 * gre[:8].sum() + 1e-15 * hre[:8].sum()
                v = v + 1e-12 * ge[:8].sum() + 1e-15 * he[:8].sum()

                if mode in ("PD", "PDW"):
                    def do_flush(args):
                        vals_r, vals_c, U_def, V_def, OV_def, OU_def = args
                        if mode == "PDW":
                            OV_def = jnp.stack(stacked_remap(
                                [V_def[:, c] for c in range(2 * G)],
                                ipos_safe))
                            OU_def = jnp.stack(stacked_remap(
                                [U_def[:, c] for c in range(2 * G)],
                                upos_safe))
                        vals_c = deferred_flush(idx_c, vals_c, cols,
                                                extend_zero(U_def), OV_def,
                                                dsigns)
                        vals_r = deferred_flush(idx_r, vals_r, rows,
                                                extend_zero(V_def), OU_def,
                                                dsigns)
                        return (vals_r, vals_c, jnp.zeros_like(U_def),
                                jnp.zeros_like(V_def),
                                jnp.zeros_like(OV_def),
                                jnp.zeros_like(OU_def))

                    pred = jnp.logical_or(jnp.mod(t, G) == G - 1, t == k - 1)
                    (vals_r, vals_c, U_def, V_def, OV_def,
                     OU_def) = jax.lax.cond(
                        pred, do_flush, lambda a: a,
                        (vals_r, vals_c, U_def, V_def, OV_def, OU_def))
                return (u, v, vals_r, vals_c, U_def, V_def, OV_def, OU_def)

            init = (u, v, vals_r, vals_c,
                    jnp.zeros((m, 2 * G), f32), jnp.zeros((n, 2 * G), f32),
                    jnp.zeros((2 * G, cols.n_slots), f32),
                    jnp.zeros((2 * G, rows.n_slots), f32))
            return jax.lax.fori_loop(0, k, body, init)
        return prog

    out = {"k": k, "G": G}

    def run(tag, prog, args):
        t0 = time.perf_counter()
        r = prog(*args)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(*args)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[tag] = {"per_rank_ms": round(dt / k * 1e3, 2),
                    "compile_s": round(compile_s, 1)}
        print(f"{tag}: {dt/k*1e3:.2f} ms/rank (compile {compile_s:.1f}s)",
              flush=True)

    modes = (os.environ.get("CRTPU_MODES") or "RW2,RW18,PDWN,PDW,PD").split(",")
    for tag in modes:
        if tag.startswith("RW"):
            run(tag, make_rw(int(tag[2:])), (u0, v0))
        elif tag == "FRC":
            run(tag, make_frc(), (u0, v0))
        else:
            run(tag, make_pd(tag), (u0, v0, vals_r0, vals_c0))
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
