"""Multi-host execution tests.

Two layers: single-process unit tests of the plumbing on the 8-virtual-device
CPU mesh, and REAL multi-process tests that spawn two worker processes
(4 virtual devices each), run ``jax.distributed.initialize`` + Gloo
cross-process collectives through the production shard_map steps of all
three sharded paths — ELL CCD++ (multihost_worker.py), panel-hybrid CCD++
(multihost_hybrid_worker.py) and ALS (multihost_als_worker.py) — and assert
the reassembled factors match the single-process sharded runs."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from cuda_recommender_tpu.parallel import multihost
from cuda_recommender_tpu.parallel.mesh import make_mesh


def test_initialize_noop_single_process():
    multihost.initialize()          # no coordinator configured -> no-op


def test_local_shard_ids_single_process():
    mesh = make_mesh()
    assert multihost.local_shard_ids(mesh) == list(range(8))


def test_assemble_global_roundtrip():
    mesh = make_mesh()
    full = np.arange(8 * 6 * 4, dtype=np.float32).reshape(48, 4)
    blocks = multihost.shard_rows_for_process(full, mesh)
    arr = multihost.assemble_global(blocks, mesh, P("d", None), full.shape)
    assert arr.shape == full.shape
    np.testing.assert_array_equal(np.asarray(arr), full)
    # sharded compute over the assembled array sees the right blocks
    s = jax.jit(lambda x: x.sum())(arr)
    assert float(s) == full.sum()


def test_assemble_global_wrong_count():
    mesh = make_mesh()
    try:
        multihost.assemble_global([np.zeros((6, 4), np.float32)], mesh,
                                  P("d", None), (48, 4))
    except ValueError as e:
        assert "local blocks" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_two_process_hybrid_matches_single_process(tmp_path):
    """Same 2-real-process discipline for the panel-hybrid flagship path:
    per-process HOST-LOCAL range-read loading of panel row blocks and
    light-ELL buckets from the binary dataset + layout manifest (each
    worker asserts exact fair-share nnz_read), replicated factors, Gloo
    psum per half-sweep; the replicated result must match the
    single-process 8-device sharded hybrid run."""
    import multihost_hybrid_worker as mw

    from cuda_recommender_tpu.data.binfmt import write_binary_dataset
    from cuda_recommender_tpu.data.datasets import synthetic as synth
    from cuda_recommender_tpu.data.shard_loader import (
        hybrid_manifest_from_plan, save_hybrid_manifest)
    from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid as ph
    Rw, Tw = synth(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    write_binary_dataset(str(tmp_path / "hyb_data"), Rw, Tw)
    plan_w = ph(Rw, mw.make_cfg(), num_shards=8, materialize_dense=False)
    save_hybrid_manifest(str(tmp_path / "hyb_manifest.npz"),
                         hybrid_manifest_from_plan(plan_w))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_hybrid_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"hybrid worker failed:\n{out}"

    from cuda_recommender_tpu.core.init import init_factors_np
    from cuda_recommender_tpu.data.datasets import synthetic
    from cuda_recommender_tpu.parallel.ccd_hybrid_sharded import (
        ccd_hybrid_train_sharded)
    from cuda_recommender_tpu.solvers.ccd_hybrid import plan_hybrid

    cfg = mw.make_cfg()
    R, T = synthetic(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    W0, H0 = init_factors_np(mw.K, mw.M, mw.N, seed=0)
    W1, H1, _ = ccd_hybrid_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                         make_mesh())

    plan = plan_hybrid(R, cfg, num_shards=8, materialize_dense=False)
    z = np.load(tmp_path / "hybrid_result.npz")
    W2 = z["W"][:, plan.user_pos]          # sorted order -> entity order
    H2 = z["H"][:, plan.item_pos]
    # cross-process Gloo psum reduction order differs in the last ulp and
    # compounds through the rank recursion — same bar as dryrun_multichip
    np.testing.assert_allclose(W1, W2, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(H1, H2, atol=2e-5, rtol=1e-4)


def test_two_process_als_matches_single_process(tmp_path):
    """ALS across 2 real processes: host-local range-read loading (each
    worker asserts exact fair-share nnz_read), one cross-process
    all_gather of the opposite factor table per half-iteration (Gloo);
    reassembled slot shards must equal the single-process 8-device
    sharded ALS run."""
    import multihost_als_worker as mw

    from cuda_recommender_tpu.data.binfmt import write_binary_dataset
    from cuda_recommender_tpu.data.datasets import synthetic as synth
    Rw, Tw = synth(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    write_binary_dataset(str(tmp_path / "als_data"), Rw, Tw)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_als_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"als worker failed:\n{out}"

    from cuda_recommender_tpu.core.config import Config
    from cuda_recommender_tpu.core.init import init_factors_np
    from cuda_recommender_tpu.data.datasets import synthetic
    from cuda_recommender_tpu.data.ell import build_ell_pair
    from cuda_recommender_tpu.parallel.als_ell_sharded import (
        als_ell_train_sharded)

    R, T = synthetic(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    ell = build_ell_pair(R, min_width=mw.MIN_WIDTH, num_shards=8)
    W0, H0 = init_factors_np(mw.K, mw.M, mw.N, seed=0, entity_major=True)
    cfg = Config(solver="als", k=mw.K, maxiter=mw.ITERS, lambda_=mw.LAM,
                 backend="ell", als_min_width=mw.MIN_WIDTH)
    W1, H1, _ = als_ell_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                      make_mesh())

    Wg = np.zeros((ell.rows_side.n_slots, mw.K), np.float32)
    Hg = np.zeros((ell.cols_side.n_slots, mw.K), np.float32)
    for pid in range(2):
        z = np.load(tmp_path / f"als_shards_{pid}.npz")
        for key in z.files:
            name, start = key.rsplit("_", 1)
            tgt = Wg if name == "W" else Hg
            blk = z[key]
            tgt[int(start):int(start) + blk.shape[0]] = blk
    np.testing.assert_allclose(W1, Wg[ell.rows_side.slot_of_entity],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(H1, Hg[ell.cols_side.slot_of_entity],
                               atol=2e-5, rtol=1e-4)


def test_two_process_distributed_matches_single_process(tmp_path):
    """Spawn 2 real OS processes, each owning 4 CPU devices, joined via
    jax.distributed.initialize; each loads ONLY its shards' rows from the
    reference-format binary dataset dir via range reads
    (data/shard_loader.py — the workers assert their nnz_read stays within
    fair share, so no process ever holds the full nnz arrays); run 2
    sharded CCD++ outer iterations with cross-process all_gather
    collectives; the factors each process's addressable shards contribute
    must reassemble to EXACTLY the single-process 8-device result (the
    step is deterministic)."""
    import multihost_worker as mw          # constants shared with the worker

    from cuda_recommender_tpu.data.binfmt import write_binary_dataset
    from cuda_recommender_tpu.data.datasets import synthetic as synth

    Rw, Tw = synth(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    write_binary_dataset(str(tmp_path / "data"), Rw, Tw)

    with socket.socket() as s:             # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    # single-process reference on this process's 8 virtual devices
    from cuda_recommender_tpu.core.config import Config
    from cuda_recommender_tpu.core.init import init_factors_np
    from cuda_recommender_tpu.data.datasets import synthetic
    from cuda_recommender_tpu.data.ell import build_ell_pair
    from cuda_recommender_tpu.parallel.ccd_ell_sharded import (
        ccd_ell_train_sharded)

    R, T = synthetic(m=mw.M, n=mw.N, nnz=mw.NNZ, seed=mw.SEED)
    ell = build_ell_pair(R, min_width=8, num_shards=8)
    W0, H0 = init_factors_np(mw.K, mw.M, mw.N, seed=0)
    cfg = Config(k=mw.K, maxiter=mw.ITERS, lambda_=mw.LAM, backend="ell")
    W1, H1, _ = ccd_ell_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                      make_mesh())

    Wg = np.zeros((mw.K, ell.rows_side.n_slots), np.float32)
    Hg = np.zeros((mw.K, ell.cols_side.n_slots), np.float32)
    seen = 0
    for pid in range(2):
        z = np.load(tmp_path / f"shards_{pid}.npz")
        for key in z.files:
            name, start = key.rsplit("_", 1)
            block = z[key]
            tgt = Wg if name == "W" else Hg
            tgt[:, int(start):int(start) + block.shape[1]] = block
            seen += block.shape[1]
    assert seen == ell.rows_side.n_slots + ell.cols_side.n_slots
    np.testing.assert_array_equal(W1, Wg[:, ell.rows_side.slot_of_entity])
    np.testing.assert_array_equal(H1, Hg[:, ell.cols_side.slot_of_entity])
