"""Probe: does Mosaic lower a VECTORIZED gather from a VMEM-resident table?

Motivation (ARCHITECTURE roadmap): the hybrid ELL tail is issue-bound at the
measured ~3.3 ns/gathered-row XLA rate — but the gathered tables are tiny
(u-pair table 3.8 MB, v-pair table 142 KB at Netflix dims), so if a Pallas
kernel can keep the table in VMEM and gather per-lane indices at VPU rates,
the tail cost ceiling drops by >10x. XLA's gather engine reads HBM per row;
a VMEM gather has no such bottleneck.

Tries three formulations on a (rows, 128) int32 index tile against a
(S, 128)-tiled f32 table (S = 8192 -> 4 MB, VMEM-resident):
  A. jnp.take(table_flat, idx, axis=0) inside the kernel
  B. table_ref[idx] fancy-indexing
  C. one-row-at-a-time pl.ds loop (scalar fallback, expected slow but legal)

Each is compiled separately; per-variant failures are caught and reported, so
one unsupported lowering does not kill the probe. Timing: pipelined
10-dispatch fence per the axon rules. Compare against the XLA row-gather
rate on the same shapes.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() == "cpu":
    print("probe wants the TPU (interpret mode proves nothing about Mosaic)")

from jax.experimental import pallas as pl  # noqa: E402

S = 8192            # table rows (fits VMEM: 8192*128*4 = 4 MB)
ROWS = 4096         # index tile rows
L = 128


def kernel_take(idx_ref, tab_ref, out_ref):
    idx = idx_ref[:]                       # (bm, L) int32
    tab = tab_ref[:]                       # (S, L) f32 — but we gather FLAT
    # gather the lane-matched element: out[r, l] = tab[idx[r, l], l]
    out_ref[:] = jnp.take_along_axis(tab, idx, axis=0)


def kernel_fancy(idx_ref, tab_ref, out_ref):
    # flat 1-D table gather: out[r, l] = tab_flat[idx[r, l]]
    tab = tab_ref[:].reshape(-1)
    out_ref[:] = tab[idx_ref[:]]


def kernel_rowloop(idx_ref, tab_ref, out_ref):
    # scalar fallback: one dynamic row slice per output row, first lane only
    def body(r, _):
        j = idx_ref[r, 0]
        out_ref[pl.ds(r, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


def run(kernel, name, idx, tab):
    bm = 512
    try:
        f = pl.pallas_call(
            kernel,
            grid=(ROWS // bm,),
            in_specs=[pl.BlockSpec((bm, L), lambda i: (i, 0)),
                      pl.BlockSpec((S, L), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((bm, L), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, L), jnp.float32),
        )
        g = jax.jit(f)
        out = g(idx, tab)
        _ = np.asarray(out).sum()
        for _ in range(3):
            out = g(idx, tab)
        _ = np.asarray(out).sum()
        t0 = time.perf_counter()
        outs = [g(idx, tab) for _ in range(10)]
        _ = np.asarray(outs[-1]).sum()
        dt = (time.perf_counter() - t0) / 10
        per_el = dt / (ROWS * L)
        print(f"{name}: OK {dt*1e3:.3f} ms/call = {per_el*1e9:.3f} ns/element")
        # correctness
        ref = np.asarray(tab).reshape(-1)[np.asarray(idx)] \
            if kernel is kernel_fancy else None
        if ref is not None:
            np.testing.assert_allclose(np.asarray(out), ref)
        return per_el
    except Exception as e:  # noqa: BLE001 — probe reports, never raises
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None


def xla_baseline(idx, tab):
    tabf = tab.reshape(-1)

    @jax.jit
    def g(idx, tabf):
        return tabf[idx]

    out = g(idx, tabf)
    _ = np.asarray(out).sum()
    t0 = time.perf_counter()
    outs = [g(idx, tabf) for _ in range(10)]
    _ = np.asarray(outs[-1]).sum()
    dt = (time.perf_counter() - t0) / 10
    print(f"XLA flat gather: {dt*1e3:.3f} ms = "
          f"{dt/(ROWS*L)*1e9:.3f} ns/element")


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((S, L)), jnp.float32)
    # lane-matched indices for take_along_axis; flat indices for fancy
    idx_rows = jnp.asarray(rng.integers(0, S, (ROWS, L)), jnp.int32)
    idx_flat = jnp.asarray(rng.integers(0, S * L, (ROWS, L)), jnp.int32)
    xla_baseline(idx_flat, tab)
    run(kernel_take, "A take_along_axis(axis=0)", idx_rows, tab)
    run(kernel_fancy, "B flat fancy-index", idx_flat, tab)
    run(kernel_rowloop, "C scalar row loop", idx_rows, tab)


if __name__ == "__main__":
    main()
