"""Per-query RetrievalEngine: oracle parity, exclusion, int8, layouts."""

import numpy as np
import pytest

from cuda_recommender_tpu.serve.engine import RetrievalEngine
from cuda_recommender_tpu.serve.retrieval import quantize_item_table


@pytest.fixture(scope="module")
def factors():
    rng = np.random.default_rng(11)
    W = rng.normal(size=(70, 8)).astype(np.float32)
    H = rng.normal(size=(53, 8)).astype(np.float32)
    return W, H


def _oracle(u, H, topk):
    s = H @ u
    order = np.argsort(-s, kind="stable")[:topk]
    return s[order], order


def test_query_by_user_matches_oracle(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    for uid in (0, 17, 69):
        s, i = eng.query(user=uid, topk=7)
        ws, wi = _oracle(W[uid], H, 7)
        np.testing.assert_array_equal(i, wi)
        np.testing.assert_allclose(s, ws, atol=1e-5)


def test_query_by_vector_equals_user_row(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    s1, i1 = eng.query(user=5, topk=10)
    s2, i2 = eng.query(u_vec=W[5], topk=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)


def test_rank_major_layout(factors):
    W, H = factors
    eng = RetrievalEngine(W.T, H.T, entity_major=False)
    s, i = eng.query(user=3, topk=5)
    ws, wi = _oracle(W[3], H, 5)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, atol=1e-5)


def test_exclusion_overfetch(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    base_s, base_i = eng.query(user=9, topk=53)   # full ranking
    excl = base_i[:4]                             # knock out the top 4
    s, i = eng.query(user=9, topk=6, exclude=excl)
    np.testing.assert_array_equal(i, base_i[4:10])
    np.testing.assert_allclose(s, base_s[4:10], atol=1e-6)
    assert not np.isin(i, excl).any()


def test_topk_exceeds_catalog(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    s, i = eng.query(user=0, topk=60)             # > 53 items
    assert (i[:53] >= 0).all() and (i[53:] == -1).all()
    assert np.isneginf(s[53:]).all()
    # the 53 real entries are the full catalog, each exactly once
    np.testing.assert_array_equal(np.sort(i[:53]), np.arange(53))


def test_int8_engine_matches_int8_quantization(factors):
    W, H = factors
    eng = RetrievalEngine(W, H, int8=True)
    Hq, scale = quantize_item_table(H)
    s, i = eng.query(user=21, topk=5)
    ws, wi = _oracle(W[21], (Hq.astype(np.float32) * scale[:, None]), 5)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-5, atol=1e-5)


def test_vector_only_engine(factors):
    _, H = factors
    eng = RetrievalEngine(None, H)
    q = np.ones(8, np.float32)
    s, i = eng.query(u_vec=q, topk=3)
    ws, wi = _oracle(q, H, 3)
    np.testing.assert_array_equal(i, wi)
    with pytest.raises(ValueError):
        eng.query(user=0, topk=3)


def test_arg_validation(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    with pytest.raises(ValueError):
        eng.query(topk=3)                          # neither
    with pytest.raises(ValueError):
        eng.query(user=0, u_vec=W[0], topk=3)      # both
    with pytest.raises(ValueError):
        eng.query(u_vec=np.ones(5, np.float32), topk=3)


def test_warmup_compiles(factors):
    W, H = factors
    eng = RetrievalEngine(W, H)
    eng.warmup(topk=4, exclude_sizes=(2,))
    s, i = eng.query(user=1, topk=4)
    assert i.shape == (4,)
