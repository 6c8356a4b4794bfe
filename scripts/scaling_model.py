"""Analytic ICI-scaling model for the sharded panel-hybrid CCD++ step.

Only one physical chip is reachable in this environment, so the BASELINE
"≥80% linear to v5e-16" target cannot be *measured* here; this model makes
the claim auditable instead of hand-waved. Functional evidence that the
sharded step computes the same math is separate and real: sharded ==
single-device on an 8-virtual-device CPU mesh (tests/test_hybrid_sharded.py)
and a 2-process jax.distributed run (tests/test_multihost.py).

Model (per outer iteration, maxinneriter=1, the headline config):

* compute: each device owns m/N panel rows and 1/N of the ELL tail rows
  (parallel/ccd_hybrid_sharded.py splits both by row block). Per-rank cost
  uses the measured single-chip decomposition: panel bytes/cell/rank at the
  measured HBM rate and the measured ~3.3 ns/gathered-row ELL rate — i.e.
  the model's single-chip prediction is anchored to bench.py's roofline,
  and its absolute scale to the measured iteration time.
* communication: the step keeps factors replicated and psums the sweep
  partials — per rank that is 2 all-reduces: (2n,) f32 after the v-sweep
  and (2m,) f32 after the u-sweep (solvers/ccd_hybrid.py rank_body). Ring
  all-reduce moves 2·(N-1)/N · payload bytes per device over ICI links.
* non-overlapped: the psums sit on the critical path between the two
  half-sweeps (the division needs the full denominator), so the model adds
  them serially — a conservative (no-overlap) estimate.

Emits one JSON line per mesh size. ICI_GBPS is per-device all-reduce
bandwidth; 45 GB/s/direction/link x multiple links is spec-class for v5e,
we use a deliberately conservative single-link-class figure and also report
the break-even bandwidth at which efficiency would drop below 80%.
"""

import json

M, N_ITEMS, NNZ, K = 480_189, 17_770, 100_000_000, 40
# --- r5 re-anchoring (VERDICT r4 next #8) ---
# The r2 model ran the XLA panel path (12 B/cell @ 819 GB/s spec) anchored
# to the 6.36 s pooled-timing measurement. The r5 terms are the PROVEN
# walls: fused Pallas panel kernels at 6 B/cell over the PADDED stair at
# the measured 678 GB/s achievable RMW rate (results/panel_floor_r5.json)
# and the ELL tail at the 6.5 ns/padded-lane residual-maintaining wall
# (results/tail_floor_r4.json), anchored to the r4 driver headline.
# The collective schedule the comm term models (2 fused psums per rank,
# static count flat in N) is validated against compiled HLO in
# results/scaling_collectives_r5.json.
PANEL_CELLS = 6_704_394_240          # block-PADDED (4096,2048) stair cells
PANEL_B_PER_CELL_RANK = 6            # fused kernel path (bench.py)
HBM = 678e9                          # measured achievable panel RMW rate
GATHER_S_PER_ROW = 6.5e-9            # residual-maintaining tail wall
TAIL_PAD = 1.073                     # measured plan pad (tail_floor_r4)
TAIL_NNZ = 2_763_221                 # headline plan nnz_light
MEASURED_ITER_S = 3.97               # BENCH_r04 driver headline
ICI_GBPS = 45e9                      # conservative per-device all-reduce rate
PSUM_LATENCY_S = 15e-6               # per small collective


def model(n_dev: int) -> dict:
    panel_s = K * (PANEL_CELLS / n_dev) * PANEL_B_PER_CELL_RANK / HBM
    tail_rows = 2 * TAIL_NNZ * TAIL_PAD / n_dev
    tail_s = K * tail_rows * GATHER_S_PER_ROW
    roofline_1 = K * (PANEL_CELLS * PANEL_B_PER_CELL_RANK / HBM
                      + 2 * TAIL_NNZ * TAIL_PAD * GATHER_S_PER_ROW)
    # anchor the model's absolute scale to the measured single-chip iter
    fudge = MEASURED_ITER_S / roofline_1
    compute_s = (panel_s + tail_s) * fudge
    if n_dev == 1:
        comm_s = 0.0
    else:
        payload = 2 * 4 * (M + N_ITEMS)              # (2m,) + (2n,) f32 per rank
        ring = 2 * (n_dev - 1) / n_dev * payload
        comm_s = K * (ring / ICI_GBPS + 2 * PSUM_LATENCY_S)
    iter_s = compute_s + comm_s
    eff = MEASURED_ITER_S / n_dev / iter_s
    # bandwidth where eff hits 0.8: comm_allowed = compute*(1/0.8 - 1)
    if n_dev > 1:
        comm_budget = compute_s * 0.25 - K * 2 * PSUM_LATENCY_S
        ring = 2 * (n_dev - 1) / n_dev * 2 * 4 * (M + N_ITEMS)
        breakeven = K * ring / comm_budget if comm_budget > 0 else float("inf")
    else:
        breakeven = 0.0
    return {"n_devices": n_dev, "iter_s": round(iter_s, 4),
            "compute_s": round(compute_s, 4), "comm_s": round(comm_s, 5),
            "updates_per_s_M": round(NNZ * K / iter_s / 1e6, 1),
            "efficiency_vs_1chip": round(eff, 4),
            "breakeven_ici_gbps_for_80pct": (round(breakeven / 1e9, 2)
                                             if breakeven != float("inf")
                                             else None)}


if __name__ == "__main__":
    for n in (1, 4, 8, 16):
        print(json.dumps(model(n)))
