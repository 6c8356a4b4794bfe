"""Sweep the Pallas GJ solve's batch block size at ml20M-ALS shapes.

scripts/als_assembly_micro.py measured the two per-iteration solves at
155 ms — ~20x the VMEM-resident traffic/FLOP model. Hypothesis: per-grid-
step overhead at BLOCK_S=128 (165k systems / 128 = 1292 blocks x k=40
elimination steps each). Bigger blocks amortize it; the pipelined kernel
fits 512-lane blocks at k=40 (9.9 MB scoped VMEM).

Usage: python scripts/gj_block_sweep.py [k=40] [S=165888]
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

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.ops.gj_pallas import (  # noqa: E402
    _pipelined_fits, gj_solve_pallas_bl)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 165_888
    interp = jax.default_backend() == "cpu"
    if interp:
        S = 2048
    n = 2 if interp else 30
    rng = np.random.default_rng(0)
    F = rng.standard_normal((k, 8, S)).astype(np.float32)
    A = jnp.asarray(np.einsum("kes,les->kls", F, F)
                    + k * np.eye(k, dtype=np.float32)[:, :, None])
    b = jnp.asarray(rng.standard_normal((k, S)), jnp.float32)

    out = {"k": k, "S": S}
    x_ref = None
    # (block_s, unroll, block_r): block_r=0 is the round-3 step-at-a-time
    # elimination; block_r>0 is the round-4 blocked panel elimination
    # (ops/gj_pallas._eliminate_blocked) that streams the full scratch
    # k/r times instead of k.
    for bs, unroll, br in ((128, True, 0), (256, True, 0),
                           (128, True, 4), (256, True, 2), (256, True, 4),
                           (256, True, 8), (512, True, 4)):
        fits = _pipelined_fits(k, bs, br)
        fn = jax.jit(lambda A, b, bs=bs, u=unroll, br=br: gj_solve_pallas_bl(
            A, b, interpret=interp, block_s=bs, unroll=u, block_r=br))
        t0 = time.perf_counter()
        x = fn(A, b)
        _ = np.asarray(x).sum()
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            x = fn(A, b)
        _ = np.asarray(x).sum()
        dt = (time.perf_counter() - t0) / n
        err = (float(jnp.max(jnp.abs(x - x_ref))) if x_ref is not None
               else 0.0)
        x_ref = x if x_ref is None else x_ref
        tag = f"bs{bs}_{'unroll' if unroll else 'fori'}" + (
            f"_r{br}" if br else "")
        out[tag] = {"ms": round(dt * 1e3, 2),
                    "pipelined": bool(fits),
                    "compile_s": round(compile_s, 1),
                    "max_diff_vs_first": round(err, 8)}
        print(f"{tag} ({'pipelined' if fits else 'manual-DMA'}): "
              f"{dt*1e3:.2f} ms (compile {compile_s:.1f}s, "
              f"maxdiff {err:.2e})", flush=True)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
