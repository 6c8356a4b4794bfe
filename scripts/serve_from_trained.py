"""Serving tied to the flagship end-to-end (VERDICT r4 next #7).

The r2 serve numbers ran on synthetic Gaussian tables; this script closes
the loop the reference's extras imply (src/extras.cpp:143-180: predict
from a SAVED model): train the HEADLINE config (Netflix-100M, k=40, bf16
NaN-sentinel panel-kernel hybrid, 7 outer iters — the bench.py workload),
``save_model`` -> ``load_model`` round-trip, then benchmark MIPS top-10
retrieval on the TRAINED factors:

  * exact f32 and int8-quantized tables at the real 17,770-item catalog,
    with recall@10 against high-rated held-out interactions;
  * the 1M-item catalog scaling point with the int8 table — the catalog
    is the trained item table tiled 57x with per-replica Gaussian jitter
    (0.05 sigma), so score DISTRIBUTIONS match trained reality (synthetic
    Gaussian tables overstate score spread); recall is not defined there
    and is not reported.

Emits results/serve_r5.json. Usage: python scripts/serve_from_trained.py
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

from cuda_recommender_tpu.core.config import Config            # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np     # noqa: E402
from cuda_recommender_tpu.data.binfmt import load_model, save_model  # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic_cached  # noqa: E402
from cuda_recommender_tpu.eval.ranking import recall_at_k      # noqa: E402
from cuda_recommender_tpu.serve.retrieval import (             # noqa: E402
    quantize_item_table, topk_mips, topk_mips_device, topk_mips_device_int8)
from cuda_recommender_tpu.solvers.ccd_hybrid import ccd_hybrid_train  # noqa: E402

M, N, NNZ, K, ITERS = 480_189, 17_770, 100_000_000, 40, 7
MODEL_PATH = "/tmp/netflix_headline_r5.model"
TOPK, BATCH, QUERIES, CHUNK = 10, 1024, 8192, 2048


def qps_run(run_batch, W, users):
    U0 = jnp.asarray(W[users[:BATCH]].astype(np.float32))
    s, i = run_batch(U0)
    np.asarray(s)                                   # compile + fence
    t0 = time.perf_counter()
    done = 0
    while done < QUERIES:
        b = users[done:done + BATCH]
        U = jnp.asarray(W[b].astype(np.float32))
        s, i = run_batch(U)
        done += BATCH
    np.asarray(s)                                   # completion fence
    return QUERIES / (time.perf_counter() - t0)


def main():
    R, T = synthetic_cached(M, N, NNZ, seed=1, test_fraction=0.02)
    out = {"workload": "serving from TRAINED flagship factors "
                       "(Netflix-100M headline config, 7 outer iters)",
           "hardware": "TPU v5e 1 chip (axon tunnel), 2026-08-20"}

    if os.path.exists(MODEL_PATH):
        W, H = load_model(MODEL_PATH, entity_major=True)
        out["train"] = {"note": f"reused {MODEL_PATH}"}
    else:
        cfg = Config(k=K, maxiter=ITERS, lambda_=0.05, backend="hybrid",
                     residual_dtype="bfloat16", mask_dtype="nan",
                     hybrid_dense_cells=6_500_000_000,
                     hybrid_panel_widths=(4096, 2048),
                     hybrid_panel_kernel=True)
        W0, H0 = init_factors_np(K, M, N, seed=0)
        t0 = time.time()
        Wr, Hr, stats = ccd_hybrid_train(R, W0, H0, T, cfg)
        t_train = time.time() - t0
        save_model(MODEL_PATH, Wr, Hr, entity_major=False)
        W, H = load_model(MODEL_PATH, entity_major=True)  # round-trip
        assert W.shape == (M, K) and H.shape == (N, K)
        out["train"] = {"iters": ITERS, "wall_s": round(t_train, 1),
                        "rmse": [round(s.rmse, 4) for s in stats],
                        "model_path": MODEL_PATH}
        print("trained:", out["train"], flush=True)

    rng = np.random.default_rng(0)
    users = rng.integers(0, M, QUERIES).astype(np.int64)
    pad = (-N) % CHUNK
    Hp = np.pad(H.astype(np.float32), ((0, pad), (0, 0)))

    Hd = jnp.asarray(Hp)
    qps_f32 = qps_run(lambda U: topk_mips_device(U, Hd, topk=TOPK,
                                                 chunk=CHUNK), W, users)
    print(f"f32 exact: {qps_f32:.0f} qps", flush=True)
    Hq, scale = quantize_item_table(Hp)
    Hqd, scd = jnp.asarray(Hq), jnp.asarray(scale)
    qps_i8 = qps_run(lambda U: topk_mips_device_int8(U, Hqd, scd, topk=TOPK,
                                                     chunk=CHUNK), W, users)
    print(f"int8 exact: {qps_i8:.0f} qps", flush=True)

    # recall@10 on trained factors, both tables (relevance: held-out >= 4.0)
    hi = T.val >= 4.0
    sample = np.unique(T.row_idx[hi])[:512]
    relevant = [T.col_idx[hi][T.row_idx[hi] == u] for u in sample]
    exclude = {int(u): R.csr_idx[R.csr_ptr[u]:R.csr_ptr[u + 1]]
               for u in sample}
    rec = {}
    for name, i8 in (("f32", False), ("int8", True)):
        _, items = topk_mips(W, H, sample, topk=TOPK, chunk=CHUNK,
                             exclude=exclude, int8=i8)
        rec[name] = round(recall_at_k(items, relevant), 4)
    print("recall@10:", rec, flush=True)

    # 1M-item catalog: trained table tiled 57x + 0.05-sigma jitter, int8
    reps = 57
    H1m = np.concatenate(
        [H.astype(np.float32)
         + rng.normal(0, 0.05, H.shape).astype(np.float32)
         for _ in range(reps)])[:1_000_000]
    pad1 = (-H1m.shape[0]) % CHUNK
    H1p = np.pad(H1m, ((0, pad1), (0, 0)))
    Hq1, sc1 = quantize_item_table(H1p)
    Hq1d, sc1d = jnp.asarray(Hq1), jnp.asarray(sc1)
    qps_1m = qps_run(lambda U: topk_mips_device_int8(U, Hq1d, sc1d,
                                                     topk=TOPK, chunk=CHUNK),
                     W, users)
    print(f"1M-item int8: {qps_1m:.0f} qps", flush=True)

    out.update({
        "catalog_17k": {"items": N, "topk": TOPK, "batch": BATCH,
                        "queries": QUERIES,
                        "qps_f32": round(qps_f32, 1),
                        "qps_int8": round(qps_i8, 1),
                        "recall_at_10": rec},
        "catalog_1m": {"items": 1_000_000, "table": "trained item factors "
                       "tiled 57x + 0.05-sigma jitter, int8",
                       "qps_int8": round(qps_1m, 1),
                       "recall": "undefined on the tiled catalog"},
        "prior": {"r2_synthetic_tables":
                  {"serve_topk_qps": 160214.1,
                   "serve_topk_1m_items_qps": 22146.0}},
    })
    with open("results/serve_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("RESULT " + json.dumps(out["catalog_17k"]), flush=True)


if __name__ == "__main__":
    main()
