"""Per-component micros for the yahoo-r1 ALS attribution (fallback).

The side-sized full/nosolve ablation programs (scripts/als_r1_decompose.py)
break the tunnel compiler at serialization (broken pipe, 4 attempts incl.
half dims), so attribute by COMPONENT with small, certain-to-compile
programs at the real shapes:

  solve   gj_solve_pallas_bl at the rows-side batch scale (S slots of
          k x k SPD systems, chunked into per-call batches) -> s/slot.
  gram    the augmented gather+gram for ONE group of the dominant
          rows-side bucket geometry (E=32, p=4, L=128 lanes; gathers from
          the (n_cols+1, k) item table) -> s/lane. This includes the row
          gather feeding the einsum — the suspected dominant term.

Extrapolation: side cost ~= lanes_total x s/lane + slots x s/slot; the
production step adds lax.map serialization + remap overheads, so the sum
is a LOWER bound whose gap to the measured 9.66 s/iter is the residual
(scheduling/overhead) term.

DCE: each timed call's RETURNED jit output is fenced (always computed);
group-difference timing. Usage: python scripts/als_r1_micro.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_crtpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402

from cuda_recommender_tpu.ops.gj_pallas import gj_solve_pallas_bl  # noqa: E402

K = 40
N_ITEMS = 98_211          # yahoo-r1 cols (other side of the rows gather)
LANES_TOTAL = 400_428_134  # measured r5 auto-floor plan (both sides)
SLOTS_TOTAL = 2_050_000    # ~rows+cols slots


def group_diff(fn, arg, n_group=6, reps=3):
    out = fn(arg)
    t0 = time.perf_counter()
    out = fn(arg)
    _ = np.asarray(out).sum()
    warm = time.perf_counter() - t0

    def grp(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(arg)
        _ = np.asarray(out).sum()
        return time.perf_counter() - t0

    t1s, tgs = [], []
    for _ in range(reps):
        t1s.append(grp(1))
        tgs.append(grp(n_group))
    per = (float(np.median(tgs)) - float(np.median(t1s))) / (n_group - 1)
    return per, warm


def main():
    rng = np.random.default_rng(0)
    out = {"workload": "yahoo-r1 ALS component micros (fallback for the "
                       "tunnel-uncompilable side ablations)",
           "hardware": "TPU v5e 1 chip (axon tunnel), 2026-08-21"}

    # --- solve: S=262144 per call, real SPD scale (~degree-59 grams) ---
    S = 262_144
    F = rng.normal(size=(S, K, 2 * K)).astype(np.float32)
    A = (np.einsum("sij,skj->sik", F, F) / (2 * K) * 59.0
         + 0.05 * np.eye(K, dtype=np.float32))
    b = rng.normal(size=(S, K)).astype(np.float32)
    A_t = jnp.asarray(A.transpose(1, 2, 0))
    b_t = jnp.asarray(b.T)

    @jax.jit
    def solve(args):
        return gj_solve_pallas_bl(args[0], args[1])

    per, _ = group_diff(solve, (A_t, b_t))
    s_per_slot = per / S
    out["solve"] = {"batch": S, "per_call_s": round(per, 4),
                    "us_per_slot": round(s_per_slot * 1e6, 3),
                    "extrapolated_both_sides_s":
                        round(s_per_slot * SLOTS_TOTAL, 3)}
    print("solve:", out["solve"], flush=True)

    # --- gram: one group of the dominant E=32/p=4 bucket ---
    # ~87k physical rows x 128 lanes = 11.2M lanes per call (the r5
    # padded-budget group size at 2 GB)
    rows_g = 87_360
    L, p, E = 128, 4, 32
    tab = jnp.asarray(rng.normal(size=(N_ITEMS + 1, K)).astype(np.float32)
                      * 0.1)
    idx = jnp.asarray(rng.integers(0, N_ITEMS, (rows_g, L)).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(rows_g, L)).astype(np.float32))
    lanes_call = rows_g * L

    class _B:                                        # bucket geometry shim
        pass

    bkt = _B()
    bkt.E, bkt.p, bkt.L = E, p, L

    from cuda_recommender_tpu.solvers.als_ell import _gram_and_rhs

    @jax.jit
    def gram(args):
        idx, val, tab = args
        G_t, r_t = _gram_and_rhs(idx, val, tab, bkt, 512,
                                 jax.lax.Precision.HIGHEST,
                                 batch_last=True, augmented=True)
        return G_t.sum(axis=(0, 1)) + r_t.sum(axis=0)   # (S,) full consumer

    per, _ = group_diff(gram, (idx, val, tab))
    s_per_lane = per / lanes_call
    out["gram"] = {"rows": rows_g, "lanes_per_call": lanes_call,
                   "per_call_s": round(per, 4),
                   "ns_per_lane": round(s_per_lane * 1e9, 3),
                   "extrapolated_both_sides_s":
                       round(s_per_lane * LANES_TOTAL, 3)}
    print("gram:", out["gram"], flush=True)

    comp = (out["solve"]["extrapolated_both_sides_s"]
            + out["gram"]["extrapolated_both_sides_s"])
    out["attribution"] = {
        "components_sum_s": round(comp, 2),
        "measured_iter_s": 9.655,
        "residual_overhead_s": round(9.655 - comp, 2),
        "note": "components extrapolate linearly over the r5 plan's lanes/"
                "slots; the residual covers lax.map group serialization, "
                "wider-bucket geometries, remaps and dispatch — a lower-"
                "bound decomposition, not a closed one",
    }
    print("RESULT " + json.dumps(out["attribution"]), flush=True)
    with open("results/als_r1_micro_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
