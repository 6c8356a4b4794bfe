"""Opt-in early stopping (--early-stop): activates the reference's dead
``-e eps`` knob (/root/reference/src/pmf.h:32 — parsed, never consumed).
OFF by default so default runs keep exact reference iteration-count parity."""

import numpy as np

from cuda_recommender_tpu.core.config import Config
from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.core.trainer import train
from cuda_recommender_tpu.solvers.reference import (als_reference,
                                                    ccd_reference,
                                                    early_stopped)
from cuda_recommender_tpu.solvers.reference import IterStats


def test_early_stopped_predicate():
    mk = lambda *r: [IterStats(oiter=i + 1, rmse=v) for i, v in enumerate(r)]  # noqa: E731
    assert not early_stopped(mk(1.0), 0.1)              # needs 2 iters
    assert not early_stopped(mk(1.0, 0.5), 0.1)         # 50% improvement
    assert early_stopped(mk(1.0, 0.95), 0.1)            # 5% < 10%
    assert early_stopped(mk(1.0, 1.2), 0.1)             # regression stops
    assert not early_stopped(mk(1.0, 0.95), 0.0)        # disabled


def test_reference_solvers_stop_early(small_data):
    R, T = small_data
    W0, H0 = init_factors_np(4, R.rows, R.cols, seed=0)
    W, H = W0.copy(), H0.copy()
    stats = ccd_reference(R, W, H, T, lambda_=0.1, maxiter=8,
                          early_stop_eps=0.9)
    assert len(stats) == 2                              # huge eps: stop asap
    Wa, Ha = init_factors_np(4, R.rows, R.cols, seed=0, entity_major=True)
    stats = als_reference(R, Wa, Ha, T, lambda_=0.1, maxiter=8,
                          early_stop_eps=0.9)
    assert len(stats) == 2


def test_trainer_early_stop_golden_parity(small_data):
    """Compiled + golden runs stop at the same iteration and still match;
    without the flag the run must use all maxiter (reference parity)."""
    R, T = small_data
    cfg = Config(k=4, lambda_=0.1, maxiter=8, backend="dense", golden=True,
                 early_stop=True, eps=0.9)
    res = train(cfg, R, T)
    assert len(res.stats) == 2 and len(res.ref_stats) == 2
    assert res.golden_W.passed and res.golden_H.passed
    res_full = train(Config(k=4, lambda_=0.1, maxiter=4, backend="dense"),
                     R, T)
    assert len(res_full.stats) == 4


def test_early_stop_sharded(small_data):
    import jax
    from cuda_recommender_tpu.parallel.mesh import make_mesh
    from cuda_recommender_tpu.parallel.ccd_ell_sharded import (
        ccd_ell_train_sharded)
    R, T = small_data
    W0, H0 = init_factors_np(4, R.rows, R.cols, seed=0)
    mesh = make_mesh(jax.devices()[:4])
    cfg = Config(k=4, lambda_=0.1, maxiter=8, backend="ell",
                 early_stop=True, eps=0.9)
    _, _, stats = ccd_ell_train_sharded(R, W0, H0, T, cfg, mesh)
    assert len(stats) == 2
