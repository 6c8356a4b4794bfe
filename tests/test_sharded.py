"""Sharded-vs-single-device equivalence on an 8-virtual-device CPU mesh —
the multi-chip analog of the reference's dual-backend golden check
(/root/reference/src/main.cpp:133-144). The driver separately validates real
multi-chip compilation via __graft_entry__.dryrun_multichip."""

import jax
import numpy as np
import pytest

from cuda_recommender_tpu.core.config import Config
from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.eval.metrics import golden_compare
from cuda_recommender_tpu.parallel.als_ell_sharded import als_ell_train_sharded
from cuda_recommender_tpu.parallel.ccd_ell_sharded import ccd_ell_train_sharded
from cuda_recommender_tpu.parallel.mesh import dense_ccd_shardings, make_mesh
from cuda_recommender_tpu.solvers.als_ell import als_ell_train
from cuda_recommender_tpu.solvers.ccd_dense import ccd_dense_train
from cuda_recommender_tpu.solvers.ccd_ell import ccd_ell_train

K = 5


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_mesh()


def test_ccd_ell_sharded_matches_single(small_data, mesh):
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    cfg = Config(k=K, maxiter=3, maxinneriter=1, lambda_=0.1, backend="ell")
    W1, H1, s1 = ccd_ell_train(R, W0.copy(), H0.copy(), T, cfg)
    WN, HN, sN = ccd_ell_train_sharded(R, W0.copy(), H0.copy(), T, cfg, mesh)
    np.testing.assert_allclose(W1, WN, atol=2e-5)
    np.testing.assert_allclose(H1, HN, atol=2e-5)
    for a, b in zip(s1, sN):
        assert abs(a.rmse - b.rmse) < 1e-4


def test_ccd_ell_sharded_inner2_addback(tiny_data, mesh):
    """Exercises the stacked-gather add-back path across shards."""
    R, T = tiny_data
    W0, H0 = init_factors_np(4, R.rows, R.cols, seed=2)
    cfg = Config(k=4, maxiter=3, maxinneriter=2, lambda_=0.05, backend="ell")
    W1, H1, _ = ccd_ell_train(R, W0.copy(), H0.copy(), T, cfg)
    WN, HN, _ = ccd_ell_train_sharded(R, W0.copy(), H0.copy(), T, cfg, mesh)
    np.testing.assert_allclose(W1, WN, atol=5e-5)
    np.testing.assert_allclose(H1, HN, atol=5e-5)


def test_als_sharded_matches_single(small_data, mesh):
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0, entity_major=True)
    cfg = Config(solver="als", k=K, maxiter=3, lambda_=0.1, backend="ell",
                 ell_chunk=256)
    W1, H1, s1 = als_ell_train(R, W0.copy(), H0.copy(), T, cfg)
    WN, HN, sN = als_ell_train_sharded(R, W0.copy(), H0.copy(), T, cfg, mesh)
    assert golden_compare(W1, WN, atol=1e-4).passed
    assert golden_compare(H1, HN, atol=1e-4).passed
    for a, b in zip(s1, sN):
        assert abs(a.rmse - b.rmse) < 1e-4


def test_sharded_checkpoint_resume(small_data, mesh, tmp_path):
    """Sharded ELL CCD checkpoint/resume equals an uninterrupted run."""
    from cuda_recommender_tpu.core.trainer import train

    R, T = small_data
    base = dict(k=4, lambda_=0.1, backend="ell")
    full = train(Config(maxiter=3, **base), R, T, mesh=mesh)
    ck = str(tmp_path / "ck")
    train(Config(maxiter=2, checkpoint_dir=ck, checkpoint_every=2, **base),
          R, T, mesh=mesh)
    resumed = train(Config(maxiter=3, checkpoint_dir=ck, checkpoint_every=2,
                           **base), R, T, mesh=mesh,
                    resume_from_checkpoint=True)
    np.testing.assert_allclose(full.W, resumed.W, atol=1e-6)
    np.testing.assert_allclose(full.H, resumed.H, atol=1e-6)


def test_ccd_dense_pjit_matches_single(small_data, mesh):
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    cfg = Config(k=K, maxiter=2, maxinneriter=1, lambda_=0.1, backend="dense")
    W1, H1, _ = ccd_dense_train(R, W0.copy(), H0.copy(), T, cfg)
    WN, HN, _ = ccd_dense_train(R, W0.copy(), H0.copy(), T, cfg,
                                shardings=dense_ccd_shardings(mesh))
    np.testing.assert_allclose(W1, WN, atol=2e-5)
    np.testing.assert_allclose(H1, HN, atol=2e-5)


def test_ccd_dense_pjit_2d_mesh(small_data):
    """2-D (users x items) blocked residual: both sweep psums ride the mesh."""
    from cuda_recommender_tpu.parallel.mesh import (dense_ccd_shardings_2d,
                                                    make_mesh_2d)

    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    cfg = Config(k=K, maxiter=2, maxinneriter=1, lambda_=0.1, backend="dense")
    W1, H1, s1 = ccd_dense_train(R, W0.copy(), H0.copy(), T, cfg)
    mesh2 = make_mesh_2d((4, 2))
    WN, HN, sN = ccd_dense_train(R, W0.copy(), H0.copy(), T, cfg,
                                 shardings=dense_ccd_shardings_2d(mesh2))
    np.testing.assert_allclose(W1, WN, atol=2e-5)
    np.testing.assert_allclose(H1, HN, atol=2e-5)
    for a, b in zip(s1, sN):
        assert abs(a.rmse - b.rmse) < 1e-4
