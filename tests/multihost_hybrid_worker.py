"""Multi-process worker for the real multi-host HYBRID test
(tests/test_multihost.py::test_two_process_hybrid_matches_single_process).

Same discipline as multihost_worker.py, but for the panel-hybrid flagship
path: each of the two processes owns 4 virtual CPU devices, joins via
``multihost.initialize``, builds ONLY its host-local row blocks of every
panel residual/mask and ELL bucket, assembles global jax.Arrays with
``multihost.assemble_global`` (factors replicated — each device holds a
full copy, fed per-device), and runs the production shard_map hybrid step
with cross-process psum collectives.

Usage: python multihost_hybrid_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from cuda_recommender_tpu.core.config import Config  # noqa: E402
from cuda_recommender_tpu.core.init import init_factors_np  # noqa: E402
from cuda_recommender_tpu.data.datasets import synthetic  # noqa: E402
from cuda_recommender_tpu.parallel import multihost  # noqa: E402
from cuda_recommender_tpu.parallel.mesh import AXIS  # noqa: E402
from cuda_recommender_tpu.parallel.ccd_hybrid_sharded import (  # noqa: E402
    make_sharded_hybrid_step)
from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid  # noqa: E402

M, N, NNZ, K, LAM, SEED, ITERS = 96, 48, 1500, 4, 0.1, 7, 2


def make_cfg():
    return Config(k=K, maxiter=ITERS, lambda_=LAM, backend="hybrid",
                  hybrid_dense_cells=24 * N, hybrid_panel_widths=(16,),
                  mask_dtype="int8")


def main() -> None:
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    mesh = multihost.global_mesh()
    n_dev = mesh.devices.size

    cfg = make_cfg()
    R, T = synthetic(m=M, n=N, nnz=NNZ, seed=SEED)
    plan = plan_hybrid(R, cfg, num_shards=n_dev, materialize_dense=True)
    rows, cols = plan.ell.rows_side, plan.ell.cols_side
    W0, _ = init_factors_np(K, M, N, seed=0)

    def put_rows(arr):               # shard-major axis 0 (buckets, lsu/lsi)
        return multihost.assemble_global(
            multihost.shard_rows_for_process(arr, mesh), mesh,
            P(AXIS, None), arr.shape)

    def put_vec(arr):                # (n_slots,) sharded slot vectors
        return multihost.assemble_global(
            multihost.shard_rows_for_process(arr, mesh), mesh, P(AXIS),
            arr.shape)

    def put_rep(arr):                # replicated: full copy per local device
        nloc = len(multihost.local_shard_ids(mesh))
        return multihost.assemble_global([arr] * nloc, mesh, P(), arr.shape)

    idx_r = tuple(put_rows(b.idx) for b in rows.buckets)
    idx_c = tuple(put_rows(b.idx) for b in cols.buckets)
    vals_r = tuple(put_rows(b.val) for b in rows.buckets)
    vals_c = tuple(put_rows(b.val) for b in cols.buckets)
    Rds = tuple(put_rows(Rp.astype(np.float32)) for Rp in plan.Rd)
    masks = tuple(put_rows(Mp.astype(np.int8)) for Mp in plan.Md)

    W = put_rep(np.asarray(W0, np.float32)[:, plan.user_order])
    H = put_rep(np.zeros((K, N), np.float32))
    u_pend = put_rep(np.zeros(M, np.float32))
    v_pend = put_rep(np.zeros(N, np.float32))
    row_nnz = put_rep(plan.row_nnz)
    col_nnz = put_rep(plan.col_nnz)
    eosr = put_vec(plan.upos_of_slot_safe)
    eosi = put_vec(plan.ipos_of_slot_safe)

    def local_map(slot_of_pos, slots_per_shard, n_ent):
        out = np.full((n_dev, n_ent), slots_per_shard, np.int32)
        owner = slot_of_pos.astype(np.int64) // slots_per_shard
        local = slot_of_pos.astype(np.int64) % slots_per_shard
        out[owner, np.arange(n_ent)] = local
        return out

    lsu = put_rows(local_map(plan.slot_of_upos, rows.slots_per_shard, M))
    lsi = put_rows(local_map(plan.slot_of_ipos, cols.slots_per_shard, N))

    step = make_sharded_hybrid_step(plan, mesh, LAM, 1,
                                    residual_dtype=jnp.float32)
    s = (Rds, vals_r, vals_c, W, H, u_pend, v_pend)
    for _ in range(ITERS):
        s = step(idx_r, idx_c, s[0], masks, s[1], s[2], s[3], s[4],
                 s[5], s[6], row_nnz, col_nnz, lsu, lsi, eosr, eosi)

    # factors are replicated — process 0's copy is the full result
    if pid == 0:
        np.savez(os.path.join(outdir, "hybrid_result.npz"),
                 W=np.asarray(s[3]), H=np.asarray(s[4]))
    print(f"hybrid worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
