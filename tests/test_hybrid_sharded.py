"""Sharded panel-hybrid: sharded == single-device on the 8-virtual-device
CPU mesh (the discipline every sharded backend follows, tests/test_sharded.py)."""

import numpy as np
import pytest

from cuda_recommender_tpu.core.config import Backend, Config
from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.parallel.ccd_hybrid_sharded import (
    ccd_hybrid_train_sharded)
from cuda_recommender_tpu.parallel.mesh import make_mesh
from cuda_recommender_tpu.solvers.ccd_hybrid import ccd_hybrid_train

K = 5


@pytest.mark.parametrize("dense_cells,widths,inner", [
    (100 * 120, (32, 16), 1),     # multi-panel stair + ELL tail
    (0, (), 1),                   # pure ELL
    (300 * 120, (32,), 1),        # all-dense
    (100 * 120, (32,), 2),        # inner iterations
])
def test_sharded_hybrid_matches_single(small_data, dense_cells, widths,
                                       inner):
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    cfg = Config(k=K, maxiter=3, maxinneriter=inner, lambda_=0.1,
                 backend="hybrid", hybrid_dense_cells=dense_cells,
                 hybrid_panel_widths=widths)
    W1, H1, s1 = ccd_hybrid_train(R, W0.copy(), H0.copy(), T, cfg)
    W8, H8, s8 = ccd_hybrid_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                          make_mesh())
    np.testing.assert_allclose(W1, W8, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(H1, H8, atol=2e-5, rtol=1e-4)
    for a, b in zip(s1, s8):
        assert abs(a.rmse - b.rmse) < 1e-5


def test_sharded_hybrid_nan_mask_matches_single(small_data):
    """NaN-sentinel masking under shard_map: sharded == single-device, and
    both == the explicit-mask single-device run (the per-device math only
    changes the mask's storage encoding)."""
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    base = dict(k=K, maxiter=3, maxinneriter=1, lambda_=0.1,
                backend="hybrid", hybrid_dense_cells=100 * R.cols,
                hybrid_panel_widths=(32, 16))
    Wm, Hm, _ = ccd_hybrid_train(R, W0.copy(), H0.copy(), T,
                                 Config(mask_dtype="bfloat16", **base))
    cfg = Config(mask_dtype="nan", **base)
    W1, H1, s1 = ccd_hybrid_train(R, W0.copy(), H0.copy(), T, cfg)
    W8, H8, s8 = ccd_hybrid_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                          make_mesh())
    np.testing.assert_array_equal(W1, Wm)
    np.testing.assert_allclose(W1, W8, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(H1, H8, atol=2e-5, rtol=1e-4)
    for a, b in zip(s1, s8):
        assert abs(a.rmse - b.rmse) < 1e-5


def test_sharded_hybrid_panel_kernel_matches_single(small_data):
    """Fused Pallas panel passes under shard_map (per-device local blocks,
    interpret mode on CPU): sharded+kernel == single-device+kernel ==
    single-device XLA schedule."""
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    base = dict(k=K, maxiter=3, maxinneriter=2, lambda_=0.1,
                backend="hybrid", hybrid_dense_cells=100 * R.cols,
                hybrid_panel_widths=(32, 16), mask_dtype="nan")
    Wx, Hx, _ = ccd_hybrid_train(R, W0.copy(), H0.copy(), T,
                                 Config(**base))
    cfg = Config(hybrid_panel_kernel=True, **base)
    W1, H1, s1 = ccd_hybrid_train(R, W0.copy(), H0.copy(), T, cfg)
    W8, H8, s8 = ccd_hybrid_train_sharded(R, W0.copy(), H0.copy(), T, cfg,
                                          make_mesh())
    np.testing.assert_allclose(W1, Wx, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(W1, W8, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(H1, H8, atol=2e-5, rtol=1e-4)
    for a, b in zip(s1, s8):
        assert abs(a.rmse - b.rmse) < 1e-5


def test_sharded_hybrid_through_trainer(small_data):
    from cuda_recommender_tpu.core.trainer import train
    R, T = small_data
    cfg = Config(k=4, maxiter=2, lambda_=0.1, backend="hybrid",
                 hybrid_dense_cells=80 * R.cols, hybrid_panel_widths=(32,))
    res_m = train(cfg, R, T, mesh=make_mesh())
    res_1 = train(cfg, R, T)
    np.testing.assert_allclose(res_m.W, res_1.W, atol=2e-5, rtol=1e-4)
    assert res_m.backend == "hybrid"


def test_auto_resolves_hybrid_for_large():
    cfg = Config(backend="auto", dense_max_cells=1000)
    assert cfg.resolve_backend(1000, 1000) == Backend.HYBRID


def test_sharded_hybrid_resume(small_data, tmp_path):
    from cuda_recommender_tpu.core.trainer import train
    R, T = small_data
    base = dict(k=4, lambda_=0.1, backend="hybrid",
                hybrid_dense_cells=80 * R.cols, hybrid_panel_widths=(32,))
    mesh = make_mesh()
    full = train(Config(maxiter=4, **base), R, T, mesh=mesh)
    ck = str(tmp_path / "ck")
    train(Config(maxiter=2, checkpoint_dir=ck, checkpoint_every=1, **base),
          R, T, mesh=mesh)
    resumed = train(Config(maxiter=4, checkpoint_dir=ck, checkpoint_every=1,
                           **base), R, T, mesh=mesh,
                    resume_from_checkpoint=True)
    np.testing.assert_allclose(full.W, resumed.W, atol=1e-6)
