"""Round-4 fix candidates for the ELL tail, driven by the HLO finding
(scripts/tail_hlo_dump.py): a (S, 2) row-gather whose tile feeds MORE THAN
ONE fusion makes XLA materialize the full (rows, L, 2) gather with its
minor dim padded 2 -> 128 lanes (64x write+read amplification) — every
tail bucket fits one lax.map chunk, so the 1-trip loop flattens and the
"bounded chunk" defense does nothing. A tile consumed by ONE fusion chain
(mode A: gather -> mul -> sibling g/h reductions) never materializes the
padded buffer and runs at ~5.4 ms/rank both sides.

Candidates, each ONE jitted program, k ranks in fori_loop with value deps:

  D2    two single-consumer pair-gather passes per side per rank:
        pass 1 [pend, old] -> residual update only (elementwise chain into
        the new vals); pass 2 [sweep, sweep] -> sibling g/h reductions with
        the NEW vals. No tile feeds two fusions.
  D2R   D2 + the 4 production stacked_remaps (owns in, g/h out) — the
        full production-shaped tail, candidate to replace
        fused_update_sweep in solvers/ccd_hybrid.py rank_body.
  GC    complex64-packed single gather + sweeps only (control vs A=5.4):
        pack [a, b] as a+ib, gather the flat (S,) c64 table -> (rows, L)
        c64 tile, NO minor dim to pad. If fast, a packed tile can be
        multi-consumed freely.
  PC    production tail on ONE packed c64 gather per side (cols side; the
        rows side needs [v_pend, v_old] + [v, v] = 2 packed gathers),
        update + sweep consuming the same materialized packed tiles.

Usage: python scripts/tail_restructure_micro.py [k=40]

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
    _bslice, _row_gather_tiles, extend_zero, lanes_to_slots, slots_to_lanes,
    stacked_remap)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
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

    def pgather(a, b, idx):
        """Materialized pair-gather tiles [(a_tile, b_tile)] per bucket."""
        return [_row_gather_tiles(extend_zero(jnp.stack([a, b], -1)), ix)
                for ix in idx]

    def cgather(a, b, idx):
        """complex64-packed gather: one flat (S+1,) c64 table, per-bucket
        (rows, L) c64 tiles (no trailing dim, nothing to pad)."""
        tab = jnp.concatenate([a + 1j * b, jnp.zeros(1, jnp.complex64)])
        zero = tab.shape[0] - 1
        out = []
        for ix in idx:
            rows_, L = ix.shape
            chunk = max(8, (1 << 19) // max(1, L))
            pad = (-rows_) % chunk
            ixp = (jnp.concatenate([ix, jnp.full((pad, L), zero, ix.dtype)])
                   if pad else ix)
            g = jax.lax.map(lambda ic: tab[ic], ixp.reshape(-1, chunk, L))
            out.append(g.reshape(-1, L)[:rows_])
        return out

    def side_update(tiles, vals, side, owns, signs, cols01=(0, 1)):
        out = []
        for i, b in enumerate(side.buckets):
            nv = vals[i]
            for j, (s, o) in enumerate(zip(signs, owns)):
                nv = nv + jnp.float32(s) * tiles[i][cols01[j]] * \
                    slots_to_lanes(_bslice(o, side, i), b)
            out.append(nv)
        return tuple(out)

    def side_sweep2(tiles, vals, side):
        """Sweep from a dedicated [s, s] pair-gather: col 0 feeds the
        g-product, col 1 the h-square — every gathered column has exactly
        one consumer op and both land in one sibling-reduction fusion."""
        gs, hs = [], []
        for i, b in enumerate(side.buckets):
            gs.append(lanes_to_slots(tiles[i][0] * vals[i], b))
            hs.append(lanes_to_slots(tiles[i][1] * tiles[i][1], b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return jnp.concatenate(gs + zt), jnp.concatenate(hs + zt)

    def side_update_c(tiles, vals, side, owns, signs):
        out = []
        for i, b in enumerate(side.buckets):
            nv = vals[i]
            parts = (jnp.real(tiles[i]), jnp.imag(tiles[i]))
            for j, (s, o) in enumerate(zip(signs, owns)):
                nv = nv + jnp.float32(s) * parts[j] * slots_to_lanes(
                    _bslice(o, side, i), b)
            out.append(nv)
        return tuple(out)

    def side_sweep_c(tiles, vals, side, part):
        gs, hs = [], []
        for i, b in enumerate(side.buckets):
            sw = part(tiles[i])
            gs.append(lanes_to_slots(sw * vals[i], b))
            hs.append(lanes_to_slots(sw * sw, b))
        tail = side.n_slots - (side.bucket_offsets[-1]
                               + side.buckets[-1].slots_per_shard)
        zt = [jnp.zeros(tail, jnp.float32)] if tail else []
        return jnp.concatenate(gs + zt), jnp.concatenate(hs + zt)

    def make(mode):
        @jax.jit
        def prog(u, v, vals_r, vals_c):
            def body(t, carry):
                u, v, vals_r, vals_c = carry
                s = 1e-9 * (t + 1).astype(jnp.float32)
                up, vo = u * s, v * s
                if mode == "GC":
                    pc = cgather(u, u, idx_c)
                    pr = cgather(v, v, idx_r)
                    g, h = side_sweep_c(pc, vals_c, cols, jnp.real)
                    gr, hr = side_sweep_c(pr, vals_r, rows, jnp.real)
                    u = u + 1e-12 * gr[:8].sum()
                    v = v + 1e-12 * g[:8].sum()
                    return u, v, vals_r, vals_c
                ovp, ovo = stacked_remap((vo, v), ipos_safe)
                oup, ouo = stacked_remap((up, u), upos_safe)
                vs = v * 0.5
                if mode == "PC":
                    pc = cgather(up, u, idx_c)
                    vals_c = side_update_c(pc, vals_c, cols, (ovp, ovo),
                                           (-1e-6, 1e-6))
                    g, h = side_sweep_c(pc, vals_c, cols, jnp.imag)
                    pr = cgather(vo, v, idx_r)
                    vals_r = side_update_c(pr, vals_r, rows, (oup, ouo),
                                           (-1e-6, 1e-6))
                    pr2 = cgather(vs, vs, idx_r)
                    gr, hr = side_sweep_c(pr2, vals_r, rows, jnp.real)
                else:  # D2 / D2R
                    pc = pgather(up, u, idx_c)
                    vals_c = side_update(pc, vals_c, cols, (ovp, ovo),
                                         (-1e-6, 1e-6))
                    pc2 = pgather(u, u, idx_c)
                    g, h = side_sweep2(pc2, vals_c, cols)
                    pr = pgather(vo, v, idx_r)
                    vals_r = side_update(pr, vals_r, rows, (oup, ouo),
                                         (-1e-6, 1e-6))
                    pr2 = pgather(vs, vs, idx_r)
                    gr, hr = side_sweep2(pr2, vals_r, rows)
                if mode in ("D2R", "PC"):
                    ge, he = stacked_remap((g, h), slot_of_ipos)
                    gre, hre = stacked_remap((gr, hr), slot_of_upos)
                    u = u + 1e-12 * gre[:8].sum()
                    v = v + 1e-12 * ge[:8].sum()
                else:
                    u = u + 1e-12 * gr[:8].sum()
                    v = v + 1e-12 * g[:8].sum()
                return u, v, vals_r, vals_c
            return jax.lax.fori_loop(0, k, body, (u, v, vals_r, vals_c))
        return prog

    out = {"k": k}
    for mode in ["GC", "D2", "D2R", "PC"]:
        prog = make(mode)
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = prog(u0, v0, vals_r0, vals_c0)
        _ = np.asarray(r[0]).sum()
        dt = time.perf_counter() - t0
        out[mode] = {"total_s": round(dt, 3),
                     "per_rank_ms": round(dt / k * 1e3, 2),
                     "compile_s": round(compile_s, 1)}
        print(f"{mode}: {dt:.3f} s = {dt/k*1e3:.2f} ms/rank "
              f"(compile {compile_s:.1f}s)", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
