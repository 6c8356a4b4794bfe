"""Ranking metric math (eval/ranking.py)."""

import numpy as np
import pytest

from cuda_recommender_tpu.eval.ranking import (hit_rate_at_k, ndcg_at_k,
                                               precision_at_k, recall_at_k)

RETRIEVED = np.array([[1, 2, 3], [4, 5, 6], [7, -1, -1]])
RELEVANT = [np.array([2, 9]), np.array([4, 5, 6]), np.array([8])]


def test_recall():
    assert recall_at_k(RETRIEVED, RELEVANT) == pytest.approx((0.5 + 1 + 0) / 3)


def test_precision():
    # -1 padding is dropped from the retrieved list
    assert precision_at_k(RETRIEVED, RELEVANT) == pytest.approx(
        (1 / 3 + 1.0 + 0.0) / 3)


def test_hit_rate():
    assert hit_rate_at_k(RETRIEVED, RELEVANT) == pytest.approx(2 / 3)


def test_ndcg_perfect_and_zero():
    assert ndcg_at_k(np.array([[1, 2]]), [np.array([1, 2])]) == pytest.approx(1.0)
    assert ndcg_at_k(np.array([[3, 4]]), [np.array([1, 2])]) == 0.0


def test_ndcg_position_sensitivity():
    top = ndcg_at_k(np.array([[1, 9, 8]]), [np.array([1])])
    bottom = ndcg_at_k(np.array([[9, 8, 1]]), [np.array([1])])
    assert top == pytest.approx(1.0) and 0 < bottom < top


def test_empty_relevant_skipped():
    assert recall_at_k(np.array([[1]]), [np.array([])]) == 0.0
