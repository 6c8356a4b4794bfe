"""Multi-process worker for the real multi-host test (tests/test_multihost.py).

Each of the two worker processes owns 4 virtual CPU devices, joins the
process group via ``multihost.initialize`` (jax.distributed), builds ONLY its
host-local blocks of the sharded ELL arrays, assembles global jax.Arrays with
``multihost.assemble_global`` (no process ever device_puts the full data),
runs 2 sharded CCD++ outer iterations with the production shard_map step, and
dumps its addressable factor shards for the test to reassemble and compare
against the single-process run.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from cuda_recommender_tpu.data.datasets import synthetic  # noqa: E402
from cuda_recommender_tpu.data.ell import build_ell_pair  # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np  # noqa: E402
from cuda_recommender_tpu.parallel import multihost  # noqa: E402
from cuda_recommender_tpu.parallel.ccd_ell_sharded import (  # noqa: E402
    make_sharded_ell_step)
from cuda_recommender_tpu.parallel.mesh import AXIS  # noqa: E402

M, N, NNZ, K, LAM, SEED, ITERS = 120, 60, 2000, 4, 0.1, 5, 2


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc
    mesh = multihost.global_mesh()
    n_dev = mesh.devices.size

    # every process derives the same deterministic dataset and layout; a real
    # loader would read only its shard rows — the assemble path is identical
    R, T = synthetic(m=M, n=N, nnz=NNZ, seed=SEED)
    ell = build_ell_pair(R, min_width=8, num_shards=n_dev)
    rows, cols = ell.rows_side, ell.cols_side
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)

    def rows_blocks(arr):            # bucket arrays: shard-major on axis 0
        return multihost.shard_rows_for_process(arr, mesh)

    def col_blocks(arr):             # (k, n_slots) factors: sharded axis 1
        per = arr.shape[1] // n_dev
        return [arr[:, i * per:(i + 1) * per]
                for i in multihost.local_shard_ids(mesh)]

    def vec_blocks(arr):             # (n_slots,) slot vectors
        return multihost.shard_rows_for_process(arr, mesh)

    def put_rows(arr):
        return multihost.assemble_global(rows_blocks(arr), mesh,
                                         P(AXIS, None), arr.shape)

    def put_cols(arr):
        return multihost.assemble_global(col_blocks(arr), mesh,
                                         P(None, AXIS), arr.shape)

    def put_vec(arr):
        return multihost.assemble_global(vec_blocks(arr), mesh, P(AXIS),
                                         arr.shape)

    idx_r = tuple(put_rows(b.idx) for b in rows.buckets)
    idx_c = tuple(put_rows(b.idx) for b in cols.buckets)
    vals_r = tuple(put_rows(b.val) for b in rows.buckets)
    vals_c = tuple(put_rows(b.val) for b in cols.buckets)

    W_s = np.zeros((K, rows.n_slots), np.float32)
    W_s[:, rows.slot_of_entity] = W0
    W = put_cols(W_s)
    H = put_cols(np.zeros((K, cols.n_slots), np.float32))
    u_pend = put_vec(np.zeros(rows.n_slots, np.float32))
    v_pend = put_vec(np.zeros(cols.n_slots, np.float32))
    nnz_r = put_vec(rows.slot_nnz)
    nnz_c = put_vec(cols.slot_nnz)

    step = make_sharded_ell_step(ell, mesh, LAM, 1)
    for _ in range(ITERS):
        vals_r, vals_c, W, H, u_pend, v_pend = step(
            idx_r, idx_c, vals_r, vals_c, W, H, nnz_r, nnz_c, u_pend, v_pend)

    # dump THIS process's addressable factor shards with their slot offsets
    out = {}
    for name, arr in (("W", W), ("H", H)):
        for s in arr.addressable_shards:
            start = s.index[1].start or 0
            out[f"{name}_{start}"] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"shards_{pid}.npz"), **out)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
