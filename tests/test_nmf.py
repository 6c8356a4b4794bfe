"""Nonnegative MF (-N): the reference PARSES the flag but never consumes it
(/root/reference/src/pmf.h:33 — no use anywhere in src/); here it carries the
original libpmf CCD++ semantics the flag came from: every rank-one update is
clamped at 0. Every compiled CCD backend must match the golden NMF solver and
produce nonnegative factors; ALS ignores the flag (no NMF path in the
reference/libpmf ALS either)."""

import numpy as np

from cuda_recommender_tpu.core.config import Config
from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.eval.metrics import calrmse_np, golden_compare
from cuda_recommender_tpu.solvers.ccd_dense import ccd_dense_train
from cuda_recommender_tpu.solvers.ccd_ell import ccd_ell_train
from cuda_recommender_tpu.solvers.ccd_hybrid import ccd_hybrid_train
from cuda_recommender_tpu.solvers.reference import ccd_reference

K = 6


def _nmf_golden(small_data):
    R, T = small_data
    W0, H0 = init_factors_np(K, R.rows, R.cols, seed=0)
    W, H = W0.copy(), H0.copy()
    stats = ccd_reference(R, W, H, T, lambda_=0.1, maxiter=3,
                          maxinneriter=1, nmf=True)
    return W0, H0, W, H, stats


def test_nmf_golden_nonnegative_and_converges(small_data):
    R, T = small_data
    W0, H0, W, H, stats = _nmf_golden(small_data)
    assert (W >= 0).all() and (H >= 0).all()
    # still converging (most of the drop from the ~3.5 zero-factor baseline
    # lands in iteration 1; later iterations must not regress)
    assert stats[-1].rmse <= stats[0].rmse < 1.0
    # and the clamp must actually bind: the unconstrained run has negatives
    Wu, Hu = W0.copy(), H0.copy()
    ccd_reference(R, Wu, Hu, T, lambda_=0.1, maxiter=3, maxinneriter=1)
    assert (Wu < 0).any() or (Hu < 0).any()


def test_nmf_compiled_backends_match_golden(small_data):
    R, T = small_data
    W0, H0, Wr, Hr, stats_r = _nmf_golden(small_data)
    for train, cfg in (
        (ccd_dense_train, Config(k=K, lambda_=0.1, maxiter=3, do_nmf=True,
                                 backend="dense")),
        (ccd_ell_train, Config(k=K, lambda_=0.1, maxiter=3, do_nmf=True,
                               backend="ell")),
        (ccd_hybrid_train, Config(k=K, lambda_=0.1, maxiter=3, do_nmf=True,
                                  backend="hybrid")),
    ):
        W, H, stats = train(R, W0.copy(), H0.copy(), T, cfg)
        assert (np.asarray(W) >= 0).all() and (np.asarray(H) >= 0).all(), cfg
        assert golden_compare(W, Wr, atol=1e-3).passed, cfg
        assert golden_compare(H, Hr, atol=1e-3).passed, cfg
        assert abs(calrmse_np(T, W, H, entity_major=False)
                   - stats_r[-1].rmse) < 1e-3, cfg


def test_nmf_via_trainer_cli_flag(small_data):
    """-N through the trainer front door (golden dual-run)."""
    from cuda_recommender_tpu.core.trainer import train
    R, T = small_data
    cfg = Config(k=K, lambda_=0.1, maxiter=2, do_nmf=True, backend="dense",
                 golden=True)
    result = train(cfg, R, T)
    assert (np.asarray(result.W) >= 0).all()
    assert result.golden_W is not None and result.golden_W.passed
