"""Multi-process worker for the real multi-host ALS test
(tests/test_multihost.py::test_two_process_als_matches_single_process).

Each of two processes owns 4 virtual CPU devices; the slot-sharded factor
tables and ELL bucket rows are fed host-locally via
``multihost.assemble_global`` and one ALS iteration all-gathers the
opposite table across processes (Gloo) — the production
make_sharded_als_step, unchanged.

Usage: python multihost_als_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from cuda_recommender_tpu.core.init import init_factors_np  # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair  # noqa: E402
from cuda_recommender_tpu.parallel import multihost  # noqa: E402
from cuda_recommender_tpu.parallel.als_ell_sharded import (  # noqa: E402
    make_sharded_als_step)
from cuda_recommender_tpu.parallel.mesh import AXIS  # noqa: E402

M, N, NNZ, K, LAM, SEED, ITERS = 120, 60, 2000, 4, 0.1, 5, 2
MIN_WIDTH = 128   # cfg.als_min_width default


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    mesh = multihost.global_mesh()
    n_dev = mesh.devices.size

    R, T = synthetic(m=M, n=N, nnz=NNZ, seed=SEED)
    ell = build_ell_pair(R, min_width=MIN_WIDTH, num_shards=n_dev)
    rows, cols = ell.rows_side, ell.cols_side
    W0, H0 = init_factors_np(K, M, N, seed=0, entity_major=True)

    def put_rows(arr):
        return multihost.assemble_global(
            multihost.shard_rows_for_process(arr, mesh), mesh,
            P(AXIS, None), arr.shape)

    def put_vec(arr):
        return multihost.assemble_global(
            multihost.shard_rows_for_process(arr, mesh), mesh, P(AXIS),
            arr.shape)

    idx_r = tuple(put_rows(b.idx) for b in rows.buckets)
    idx_c = tuple(put_rows(b.idx) for b in cols.buckets)
    vals_r = tuple(put_rows(b.val) for b in rows.buckets)
    vals_c = tuple(put_rows(b.val) for b in cols.buckets)

    W_s = np.zeros((rows.n_slots, K), np.float32)
    W_s[rows.slot_of_entity] = np.asarray(W0, np.float32)
    H_s = np.zeros((cols.n_slots, K), np.float32)
    H_s[cols.slot_of_entity] = np.asarray(H0, np.float32)
    W, H = put_rows(W_s), put_rows(H_s)
    nnz_r = put_vec(rows.slot_nnz)
    nnz_c = put_vec(cols.slot_nnz)

    step = make_sharded_als_step(ell, mesh, LAM, 512)
    for _ in range(ITERS):
        W, H = step(idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c)

    # dump THIS process's addressable slot-row shards
    out = {}
    for name, arr in (("W", W), ("H", H)):
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            out[f"{name}_{start}"] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"als_shards_{pid}.npz"), **out)
    print(f"als worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
