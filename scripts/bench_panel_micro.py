"""Microbenchmark the fused NaN-sentinel panel kernels on the TPU.

Times each pass PIPELINED — N back-to-back async dispatches with ONE
full-tensor fence — because a single-dispatch reading includes the ~27 ms
tunnel round-trip (that artifact once mis-motivated an entire kernel
rewrite; see results/panel_kernel_micro_r2.json for the variant matrix
this methodology produced). Compares against the XLA einsum schedule for
the same math.

Usage: python scripts/bench_panel_micro.py [M] [W] [bm] [bw]
Defaults: the 3.05e9-cell Netflix-panel-0-like shape, current kernel
block defaults (ops/panel_pallas.BM/BW, env-overridable).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp      # noqa: E402
import numpy as np           # noqa: E402

from cuda_recommender_tpu.ops import panel_pallas as pp   # noqa: E402


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 165_376
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 18_432
    bm = int(sys.argv[3]) if len(sys.argv) > 3 else pp.BM
    bw = int(sys.argv[4]) if len(sys.argv) > 4 else pp.BW
    interp = jax.default_backend() == "cpu"      # CPU smoke of the flow
    n = 1 if interp else 10
    gb = M * W * 2 / 1e9

    @jax.jit
    def init():
        r = jax.lax.broadcasted_iota(jnp.int32, (M, W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (M, W), 1)
        obs = ((r * 7 + c * 13) % 41) == 0
        return jnp.where(obs, 1.0, jnp.nan).astype(jnp.bfloat16)

    rng = np.random.default_rng(0)
    uo = jnp.asarray(rng.normal(size=M).astype(np.float32))
    up = jnp.asarray(rng.normal(size=M).astype(np.float32))
    vo = jnp.asarray(rng.normal(size=W).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=W).astype(np.float32))

    kA = jax.jit(functools.partial(pp.panel_update_vsweep, bm=bm, bw=bw, interpret=interp),
                 donate_argnums=0)
    Rd = init()
    Rd, g, h = kA(Rd, uo, up, vo, vp)
    np.asarray(g)
    t0 = time.perf_counter()
    for _ in range(n):
        Rd, g, h = kA(Rd, uo, up, vo, vp)
    np.asarray(g)
    dt = (time.perf_counter() - t0) / n
    print(f"update_vsweep bm={bm} bw={bw}: {dt*1e3:.1f} ms "
          f"({3 * gb / dt:.0f} GB/s eff of 819 floor)", flush=True)

    kB = jax.jit(functools.partial(pp.panel_usweep, bm=bm, bw=bw, interpret=interp))
    g, h = kB(Rd, vo)
    np.asarray(g)
    t0 = time.perf_counter()
    for _ in range(n):
        g, h = kB(Rd, vo)
    np.asarray(g)
    dt = (time.perf_counter() - t0) / n
    print(f"usweep        bm={bm} bw={bw}: {dt*1e3:.1f} ms "
          f"({gb / dt:.0f} GB/s eff)", flush=True)

    kV = jax.jit(functools.partial(pp.panel_vsweep, bm=bm, bw=bw, interpret=interp))
    g, h = kV(Rd, uo)
    np.asarray(g)
    t0 = time.perf_counter()
    for _ in range(n):
        g, h = kV(Rd, uo)
    np.asarray(g)
    dt = (time.perf_counter() - t0) / n
    print(f"vsweep        bm={bm} bw={bw}: {dt*1e3:.1f} ms "
          f"({gb / dt:.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main()
