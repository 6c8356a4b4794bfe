"""Serving stack: pair scoring, predict-file parity, MIPS top-k retrieval."""

import numpy as np
import pytest

from cuda_recommender_tpu.data.binfmt import save_model
from cuda_recommender_tpu.models.mf import MFModel
from cuda_recommender_tpu.eval.ranking import recall_at_k
from cuda_recommender_tpu.serve.retrieval import topk_mips
from cuda_recommender_tpu.serve.scoring import (predict_pairs,
                                                predict_to_file, score_users)


@pytest.fixture(scope="module")
def factors():
    rng = np.random.default_rng(3)
    W = rng.normal(size=(60, 8)).astype(np.float32)
    H = rng.normal(size=(45, 8)).astype(np.float32)
    return W, H


def test_predict_pairs_matches_numpy(factors):
    W, H = factors
    rng = np.random.default_rng(0)
    ui = rng.integers(0, 60, 500)
    ij = rng.integers(0, 45, 500)
    got = predict_pairs(W, H, ui, ij, entity_major=True)
    want = np.einsum("ek,ek->e", W[ui], H[ij])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # rank-major layout path (CCD factors)
    got2 = predict_pairs(W.T, H.T, ui, ij, entity_major=False)
    np.testing.assert_allclose(got2, want, atol=1e-5)


def test_score_users(factors):
    W, H = factors
    S = score_users(W, H, [0, 7, 59], entity_major=True)
    np.testing.assert_allclose(S, W[[0, 7, 59]] @ H.T, atol=1e-4)


def test_topk_mips_matches_bruteforce(factors):
    W, H = factors
    users = np.arange(20)
    scores, items = topk_mips(W, H, users, topk=5, chunk=16)
    full = W[users] @ H.T
    for b in range(len(users)):
        want = np.argsort(-full[b])[:5]
        np.testing.assert_array_equal(np.sort(items[b]), np.sort(want))
        np.testing.assert_allclose(np.sort(scores[b]),
                                   np.sort(full[b][want]), rtol=1e-5)


def test_topk_mips_exclude(factors):
    W, H = factors
    excl = {0: np.array([int(np.argmax(W[0] @ H.T))])}
    _, items = topk_mips(W, H, [0], topk=3, chunk=16, exclude=excl)
    assert excl[0][0] not in items[0]


def test_recall_at_k():
    retrieved = np.array([[1, 2, 3], [4, 5, 6]])
    relevant = [np.array([2, 9]), np.array([4, 5, 6])]
    assert recall_at_k(retrieved, relevant) == pytest.approx((0.5 + 1.0) / 2)


def test_predict_to_file_parity(factors, tmp_path, capsys):
    """Output-file + final-RMSE parity with calculate_rmse_from_file
    (/root/reference/src/extras.cpp:143-180): 1-based test ids, one
    prediction per line."""
    W, H = factors
    model = str(tmp_path / "model")
    save_model(model, W, H, entity_major=True)
    test_path = tmp_path / "test.txt"
    test_path.write_text("1 1 3.0\n2 5 1.5\n60 45 0.0\n")
    out_path = str(tmp_path / "output")
    rmse = predict_to_file(model, str(test_path), out_path)
    preds = np.loadtxt(out_path)
    want = np.array([W[0] @ H[0], W[1] @ H[4], W[59] @ H[44]])
    np.testing.assert_allclose(preds, want, atol=1e-4)
    assert rmse == pytest.approx(
        np.sqrt(np.mean((want - [3.0, 1.5, 0.0]) ** 2)), abs=1e-5)
    assert "[FINAL INFO] Test RMSE" in capsys.readouterr().out


def test_mfmodel_roundtrip(factors, tmp_path):
    W, H = factors
    m = MFModel.from_factors(W.T, H.T, entity_major=False)   # CCD layout in
    assert m.k == 8 and m.num_users == 60 and m.num_items == 45
    p = str(tmp_path / "m.bin")
    m.save(p)
    m2 = MFModel.load(p)
    np.testing.assert_array_equal(m.W, m2.W)
    pred = m2.predict([0, 1], [0, 1])
    np.testing.assert_allclose(
        pred, [W[0] @ H[0], W[1] @ H[1]], atol=1e-5)


def test_mips_recall_after_training(small_data):
    """End-to-end: train, then retrieval recall@10 on held-out items beats a
    popularity-free random baseline by a wide margin."""
    from cuda_recommender_tpu.core.config import Config
    from cuda_recommender_tpu.core.trainer import train

    R, T = small_data
    res = train(Config(solver="als", k=8, maxiter=5, lambda_=0.1), R, T)
    model = MFModel.from_factors(res.W, res.H, entity_major=True)
    users = np.unique(T.row_idx)[:50]
    relevant = [T.col_idx[T.row_idx == u] for u in users]
    exclude = {int(u): R.csr_idx[R.csr_ptr[u]:R.csr_ptr[u + 1]] for u in users}
    _, items = topk_mips(model.W, model.H, users, topk=10, chunk=64,
                         exclude=exclude)
    rec = recall_at_k(items, relevant)
    assert rec > 0.11      # random would be ~10/120 = 0.083; MF gets ~0.14


def test_topk_mips_sharded_matches_single(factors):
    from cuda_recommender_tpu.parallel.mesh import make_mesh
    from cuda_recommender_tpu.serve.retrieval_sharded import topk_mips_sharded

    W, H = factors
    users = np.arange(12)
    mesh = make_mesh()
    s1, i1 = topk_mips(W, H, users, topk=5, chunk=16)
    sN, iN = topk_mips_sharded(W, H, users, mesh, topk=5, chunk=16)
    for b in range(len(users)):
        np.testing.assert_array_equal(np.sort(i1[b]), np.sort(iN[b]))
        np.testing.assert_allclose(np.sort(s1[b]), np.sort(sN[b]), rtol=1e-5)


def test_topk_mips_sharded_negative_scores_and_exclude(factors):
    """All-negative queries: pad rows (score 0) must not displace real items."""
    from cuda_recommender_tpu.parallel.mesh import make_mesh
    from cuda_recommender_tpu.serve.retrieval_sharded import topk_mips_sharded

    W, H = factors
    Wneg = -np.abs(W)       # scores vs |H| strongly negative
    Hpos = np.abs(H)
    users = np.array([0, 3])
    mesh = make_mesh()
    s1, i1 = topk_mips(Wneg, Hpos, users, topk=4, chunk=16)
    sN, iN = topk_mips_sharded(Wneg, Hpos, users, mesh, topk=4, chunk=16)
    for b in range(2):
        assert (iN[b] >= 0).all()
        np.testing.assert_array_equal(np.sort(i1[b]), np.sort(iN[b]))
    excl = {0: np.array([int(i1[0][0])])}
    _, ie = topk_mips_sharded(Wneg, Hpos, users, mesh, topk=4, chunk=16,
                              exclude=excl)
    assert i1[0][0] not in ie[0]


def test_int8_retrieval_matches_f32():
    """int8-quantized retrieval: per-item dequantization error is bounded by
    amax/127, and the returned top-k substantially agrees with the f32 path
    (scores within quantization tolerance)."""
    import numpy as np
    from cuda_recommender_tpu.serve.retrieval import (quantize_item_table,
                                                      topk_mips)
    rng = np.random.default_rng(5)
    n, k, B = 700, 16, 8
    H = rng.normal(size=(n, k)).astype(np.float32)
    W = rng.normal(size=(64, k)).astype(np.float32)
    Hq, scale = quantize_item_table(H)
    err = np.abs(H - Hq.astype(np.float32) * scale[:, None]).max(axis=1)
    assert np.all(err <= np.abs(H).max(axis=1) / 127.0 + 1e-6)

    users = np.arange(B)
    s32, i32 = topk_mips(W, H, users, topk=10, chunk=128)
    s8, i8 = topk_mips(W, H, users, topk=10, chunk=128, int8=True)
    overlap = np.mean([len(np.intersect1d(a, b)) for a, b in zip(i32, i8)])
    assert overlap >= 8.0                       # ≥80% top-10 agreement
    # where the item sets agree, scores agree to quantization tolerance
    for b in range(B):
        common = np.intersect1d(i32[b], i8[b])
        m32 = {i: v for i, v in zip(i32[b], s32[b])}
        m8 = {i: v for i, v in zip(i8[b], s8[b])}
        for it in common:
            assert abs(m32[it] - m8[it]) < 0.15


def test_int8_retrieval_with_exclusions():
    import numpy as np
    from cuda_recommender_tpu.serve.retrieval import topk_mips
    rng = np.random.default_rng(6)
    H = rng.normal(size=(300, 8)).astype(np.float32)
    W = rng.normal(size=(10, 8)).astype(np.float32)
    excl = {0: np.arange(50), 3: np.array([5, 7])}
    _, ids = topk_mips(W, H, np.arange(10), topk=5, chunk=128, int8=True,
                       exclude=excl)
    assert not np.isin(ids[0], excl[0]).any()
    assert not np.isin(ids[3], excl[3]).any()
    assert (ids >= 0).all()
