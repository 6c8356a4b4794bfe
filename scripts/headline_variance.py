"""Bisect the bench.py-vs-scripts headline gap (VERDICT r2 weak #1).

Round-2 record: bench.py measured 7.9 s/iter (then 7.0, then 8.8 at round-3
HEAD) for the exact headline config that scripts/bench_hybrid_tpu.py and
scripts/decompose_hybrid_tpu.py measure at 5.3-5.8 s/iter — a persistent
~35% gap between two programs running the SAME jitted step on the SAME
data. This script reproduces bench.py's flow step by step and times MANY
individual iterations to separate the candidate causes:

  * state-evolution slowdown (iteration time growing as factors converge —
    e.g. bf16 denormal/NaN population changes in the residual);
  * the bench.py tunnel-probe subprocess (a throwaway `jax.devices()`
    process that could leave the tunneled device degraded);
  * plain chip/tunnel temporal variance (flat-but-shifted sample sets).

Usage: python scripts/headline_variance.py [n_iters=12] [--probe]
"""

import json
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

PROBE = "--probe" in sys.argv
if PROBE:
    # replicate bench.py's _tunnel_healthy() probe BEFORE backend init
    r = subprocess.run([sys.executable, "-c",
                        "import jax; jax.devices()"],
                       timeout=240, capture_output=True)
    print("probe rc", r.returncode, flush=True)

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp                                          # noqa: E402

from cuda_recommender_tpu.core.config import Config              # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np       # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.solvers.ccd_hybrid import (            # noqa: E402
    densify_panels, make_hybrid_outer_step, plan_hybrid)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("-") else 12
    m, n, nnz, k = 480_189, 17_770, 100_000_000, 40
    lam = 0.05
    R, T = synthetic_cached(m, n, nnz, seed=1, test_fraction=0.02)
    cfg = Config(k=k, lambda_=lam, backend="hybrid",
                 residual_dtype="bfloat16", mask_dtype="nan",
                 hybrid_dense_cells=6_500_000_000,
                 hybrid_panel_widths=(4096, 2048))
    plan = plan_hybrid(R, cfg, materialize_dense=False)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    rdt = jnp.dtype("bfloat16")
    Rds, masks = densify_panels(plan, rdt, mask_dtype="nan", block_pad=True)

    idx_r = tuple(jnp.asarray(b.idx) for b in rows.buckets)
    idx_c = tuple(jnp.asarray(b.idx) for b in cols.buckets)
    W0, _ = init_factors_np(k, m, n, seed=0)
    s = (Rds, tuple(jnp.asarray(b.val) for b in rows.buckets),
         tuple(jnp.asarray(b.val) for b in cols.buckets),
         jnp.asarray(W0[:, plan.user_order]),
         jnp.zeros((k, n), jnp.float32),
         jnp.zeros(m, jnp.float32), jnp.zeros(n, jnp.float32))
    consts = (jnp.asarray(plan.row_nnz), jnp.asarray(plan.col_nnz),
              jnp.asarray(plan.upos_of_slot_safe),
              jnp.asarray(plan.ipos_of_slot_safe),
              jnp.asarray(plan.slot_of_upos), jnp.asarray(plan.slot_of_ipos))
    step = make_hybrid_outer_step(plan, lam, 1, residual_dtype=rdt,
                                  nan_mask=True, panel_kernel=True)

    def run(s):
        return step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                    s[5], s[6], *consts)

    t0 = time.perf_counter()
    s = run(s)
    _ = np.asarray(s[3]).sum()
    print(f"compile+iter1: {time.perf_counter()-t0:.1f}s", flush=True)

    def xfer():
        t0 = time.perf_counter()
        _ = np.asarray(s[3]).sum()
        return time.perf_counter() - t0

    # transfer time is itself a distribution over the tunnel — sample it
    xfers = [round(xfer(), 3) for _ in range(5)]
    t_xfer = float(np.median(xfers))
    print(f"t_xfer samples: {xfers} (median {t_xfer:.3f})", flush=True)

    # Phase A: bench.py-style per-iteration full fences
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = run(s)
        _ = np.asarray(s[3]).sum()
        samples.append(round(time.perf_counter() - t0 - t_xfer, 3))
        print(f"A iter {i + 2}: {samples[-1]:.3f}s", flush=True)

    # Phase B: decompose-style pooled groups (3 back-to-back dispatches,
    # ONE fence) — if B << A, the gap is fencing overhead, not solver work
    pooled = []
    for g in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            s = run(s)
        _ = np.asarray(s[3]).sum()
        pooled.append(round((time.perf_counter() - t0 - t_xfer) / 3, 3))
        print(f"B group {g}: {pooled[-1]:.3f}s/iter", flush=True)

    # Phase C: per-iteration fences again, ~30 state iterations later — if
    # C >> A the slowdown tracks STATE EVOLUTION, not methodology
    late = []
    for i in range(max(4, iters // 3)):
        t0 = time.perf_counter()
        s = run(s)
        _ = np.asarray(s[3]).sum()
        late.append(round(time.perf_counter() - t0 - t_xfer, 3))
        print(f"C iter: {late[-1]:.3f}s", flush=True)
    xfers_end = [round(xfer(), 3) for _ in range(3)]
    print(f"t_xfer at end: {xfers_end}", flush=True)

    out = {"workload": "headline variance probe", "probe_subprocess": PROBE,
           "k": k, "t_xfer_samples": xfers, "t_xfer_s": round(t_xfer, 3),
           "t_xfer_end_samples": xfers_end,
           "per_iter_fenced_samples": samples,
           "per_iter_fenced_median_s": round(float(np.median(samples)), 3),
           "pooled_3x_samples": pooled,
           "pooled_median_s": round(float(np.median(pooled)), 3),
           "late_per_iter_fenced_samples": late,
           "late_median_s": round(float(np.median(late)), 3)}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
