"""Golden-solver tests: math invariants of the NumPy reference implementations.

These anchor the semantics every compiled backend is validated against, so they
check the reference-repo invariants directly (SURVEY.md §7 checklist)."""

import numpy as np

from cuda_recommender_tpu.core.init import init_factors_np
from cuda_recommender_tpu.data.sparse import from_coo
from cuda_recommender_tpu.eval.metrics import (calloss_np, calrmse_np,
                                               golden_compare)
from cuda_recommender_tpu.solvers.reference import (als_reference,
                                                    ccd_reference)


def _dense_ccd(Rd, mask, W, H, lam, maxiter, inner):
    """Independent brute-force dense CCD++ oracle (pure numpy, no sparse)."""
    k = W.shape[0]
    H = H * 0.0
    resid = Rd.copy()
    col_nnz = mask.sum(axis=0)
    row_nnz = mask.sum(axis=1)
    for oiter in range(1, maxiter + 1):
        for t in range(k):
            u, v = W[t].copy(), H[t].copy()
            if oiter > 1:
                resid += np.outer(u, v) * mask
            for _ in range(inner):
                g = u @ (resid * mask)
                h = lam * col_nnz + (u * u) @ mask
                v = np.divide(g, h, out=np.zeros_like(g), where=h > 0)
                g = (resid * mask) @ v
                h = lam * row_nnz + mask @ (v * v)
                u = np.divide(g, h, out=np.zeros_like(g), where=h > 0)
            W[t], H[t] = u, v
            resid -= np.outer(u, v) * mask
    return W, H


def test_ccd_matches_dense_oracle(tiny_data):
    R, T = tiny_data
    k = 4
    W, H = init_factors_np(k, R.rows, R.cols, seed=0)
    W2, H2 = W.copy(), H.copy()
    ccd_reference(R, W, H, T, lambda_=0.1, maxiter=3, maxinneriter=2)

    Rd = R.to_dense().astype(np.float64)
    mask = (Rd != 0).astype(np.float64)
    Wd, Hd = _dense_ccd(Rd, mask, W2.astype(np.float64), H2.astype(np.float64),
                        0.1, 3, 2)
    np.testing.assert_allclose(W, Wd, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(H, Hd, rtol=2e-3, atol=1e-5)


def test_ccd_converges(small_data):
    R, T = small_data
    k = 8
    W, H = init_factors_np(k, R.rows, R.cols, seed=0)
    rmse0 = calrmse_np(T, W, np.zeros_like(H), entity_major=False)
    stats = ccd_reference(R, W, H, T, lambda_=0.05, maxiter=5)
    assert stats[-1].rmse < stats[0].rmse < rmse0 + 1e-6
    assert stats[-1].rmse < 0.9  # low-rank ground truth → good fit
    # monotone-ish decrease of training RMSE expectation: loss decreases
    loss = calloss_np(R, W, H, entity_major=False)
    assert np.isfinite(loss)


def test_ccd_empty_rows_cols_zero():
    # entity 3 (row) and 4 (col) have no ratings → factors must be exactly 0
    r = [0, 0, 1, 2, 4]
    c = [0, 1, 2, 3, 0]
    v = [4.0, 3.0, 5.0, 2.0, 1.0]
    R = from_coo(5, 5, r, c, v)
    from cuda_recommender_tpu.data.sparse import make_test
    T = make_test(5, 5, [0], [0], [4.0])
    W, H = init_factors_np(3, 5, 5, seed=1)
    ccd_reference(R, W, H, T, lambda_=0.1, maxiter=2)
    assert (W[:, 3] == 0).all()
    assert (H[:, 4] == 0).all()


def test_als_normal_equations(tiny_data):
    """Each ALS half-update must satisfy its normal equations exactly."""
    R, T = tiny_data
    k = 5
    W, H = init_factors_np(k, R.rows, R.cols, seed=0, entity_major=True)
    H0 = H.copy()
    als_reference(R, W, H, T, lambda_=0.1, maxiter=1)
    # Recompute W from H0 and check optimality row by row (W used old H)
    Rd = R.to_dense()
    for i in range(R.rows):
        obs = Rd[i] != 0
        if not obs.any():
            assert (W[i] == 0).all()
            continue
        F = H0[obs]
        G = F.T @ F + 0.1 * np.eye(k, dtype=np.float32)
        b = F.T @ Rd[i][obs]
        np.testing.assert_allclose(G @ W[i], b, rtol=2e-3, atol=1e-4)
    # H used the NEW W (Gauss-Seidel across sides, src/ALS.cpp:98-219)
    for j in range(R.cols):
        obs = Rd[:, j] != 0
        if not obs.any():
            assert (H[j] == 0).all()
            continue
        F = W[obs]
        G = F.T @ F + 0.1 * np.eye(k, dtype=np.float32)
        b = F.T @ Rd[:, j][obs]
        np.testing.assert_allclose(G @ H[j], b, rtol=2e-3, atol=1e-4)


def test_als_converges(small_data):
    R, T = small_data
    k = 8
    W, H = init_factors_np(k, R.rows, R.cols, seed=0, entity_major=True)
    stats = als_reference(R, W, H, T, lambda_=0.1, maxiter=5)
    assert stats[-1].rmse <= stats[0].rmse
    assert stats[-1].rmse < 0.9


def test_golden_compare_tolerance():
    a = np.array([1.0, 2.0, 3.0])
    res = golden_compare(a * 1.05, a)      # within 10%
    assert res.passed and res.message() == "Check... PASS!"
    res = golden_compare(a * 1.2, a)       # 20% off
    assert not res.passed and res.error_count == 3
    assert "NO PASS" in res.message()


def test_calrmse_r1():
    from cuda_recommender_tpu.data.sparse import make_test
    from cuda_recommender_tpu.eval.metrics import calrmse_r1_np
    T = make_test(3, 3, [0, 1], [1, 2], [2.0, 4.0])
    wt = np.array([1.0, 2.0, 0.0], np.float32)
    ht = np.array([0.0, 1.0, 1.5], np.float32)
    rmse, resid = calrmse_r1_np(T, T.val, wt, ht)
    np.testing.assert_allclose(resid, [2.0 - 1.0, 4.0 - 3.0])
    np.testing.assert_allclose(rmse, 1.0)
