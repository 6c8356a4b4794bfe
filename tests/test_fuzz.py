"""Randomized cross-backend fuzz: for random shapes/ranks/hyperparameters,
every compiled backend must track the golden solver (the dual-backend
discipline applied across the config space, not just the happy path)."""

import numpy as np
import pytest

from cuda_recommender_tpu.core.config import Config
from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.data import datasets
from cuda_recommender_tpu.eval.metrics import golden_compare
from cuda_recommender_tpu.solvers.als_ell import als_ell_train
from cuda_recommender_tpu.solvers.ccd_dense import ccd_dense_train
from cuda_recommender_tpu.solvers.ccd_ell import ccd_ell_train
from cuda_recommender_tpu.solvers.ccd_hybrid import ccd_hybrid_train
from cuda_recommender_tpu.solvers.reference import als_reference, ccd_reference

CASES = [
    # (m, n, nnz, k, lam, inner, power_law)
    (97, 53, 900, 3, 0.03, 1, True),
    (64, 200, 2500, 7, 0.5, 2, False),
    (310, 41, 4000, 5, 0.1, 3, True),
]


@pytest.mark.parametrize("m,n,nnz,k,lam,inner,pl", CASES)
def test_ccd_backends_fuzz(m, n, nnz, k, lam, inner, pl):
    R, T = datasets.synthetic(m=m, n=n, nnz=nnz, seed=m + n, power_law=pl)
    W0, H0 = init_factors_np(k, R.rows, R.cols, seed=k)
    Wr, Hr = W0.copy(), H0.copy()
    ccd_reference(R, Wr, Hr, T, lambda_=lam, maxiter=2, maxinneriter=inner)
    cfg = Config(k=k, maxiter=2, maxinneriter=inner, lambda_=lam)
    for backend in ("dense", "ell", "hybrid-kernel"):
        extra = {}
        if backend == "hybrid-kernel":
            # fused Pallas panel path (interpret mode on CPU) across the
            # same random config space
            extra = dict(mask_dtype="nan", hybrid_panel_kernel=True,
                         hybrid_dense_cells=(m // 2) * n,
                         hybrid_panel_widths=(max(8, n // 4),))
        cfg2 = Config(k=k, maxiter=2, maxinneriter=inner, lambda_=lam,
                      backend=backend.split("-")[0], **extra)
        trainer = {"dense": ccd_dense_train, "ell": ccd_ell_train,
                   "hybrid": ccd_hybrid_train}[backend.split("-")[0]]
        W, H, _ = trainer(R, W0.copy(), H0.copy(), T, cfg2)
        g = golden_compare(W, Wr, atol=1e-3)
        assert g.passed, f"{backend} {g.message()}"
        assert golden_compare(H, Hr, atol=1e-3).passed


@pytest.mark.parametrize("m,n,nnz,k,lam", [(97, 53, 900, 3, 0.03),
                                           (64, 200, 2500, 7, 0.5)])
def test_als_fuzz(m, n, nnz, k, lam):
    R, T = datasets.synthetic(m=m, n=n, nnz=nnz, seed=m, power_law=True)
    W0, H0 = init_factors_np(k, R.rows, R.cols, seed=1, entity_major=True)
    Wr, Hr = W0.copy(), H0.copy()
    als_reference(R, Wr, Hr, T, lambda_=lam, maxiter=2)
    cfg = Config(solver="als", k=k, maxiter=2, lambda_=lam)
    W, H, _ = als_ell_train(R, W0.copy(), H0.copy(), T, cfg)
    assert golden_compare(W, Wr, atol=2e-3).error_percentage < 0.5
    assert golden_compare(H, Hr, atol=2e-3).error_percentage < 0.5
