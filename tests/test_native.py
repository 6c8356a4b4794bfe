"""Native C++ layer: build, parse parity, ELL-fill parity with Python path."""

import numpy as np
import pytest

from cuda_recommender_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_textparse_matches_numpy(tmp_path):
    from cuda_recommender_tpu.data.datasets import load_text_ratings
    from cuda_recommender_tpu.native.textparse import load_text_ratings as nat

    p = tmp_path / "r.txt"
    p.write_text("1 5 3.5\n2 1 4.0 838484\n17 3 0.5\n\n3 3 2\n")
    r1, c1, v1 = load_text_ratings(str(p))
    r2, c2, v2 = nat(str(p))
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(v1, v2)


def test_textparse_zero_based(tmp_path):
    from cuda_recommender_tpu.native.textparse import load_text_ratings as nat
    p = tmp_path / "r.txt"
    p.write_text("0 0 1.0\n4 9 2.0\n")
    r, c, v = nat(str(p), one_based=False)
    assert r.tolist() == [0, 4] and c.tolist() == [0, 9]


def test_ell_fill_matches_python(small_data, monkeypatch):
    """build_ell_pair with and without the native fill must be identical."""
    from cuda_recommender_tpu.data import ell as ell_mod

    R, _ = small_data
    pair_native = ell_mod.build_ell_pair(R, min_width=8, num_shards=4)

    import cuda_recommender_tpu.native as nat
    monkeypatch.setattr(nat, "available", lambda: False)
    pair_py = ell_mod.build_ell_pair(R, min_width=8, num_shards=4)

    for side_n, side_p in ((pair_native.rows_side, pair_py.rows_side),
                           (pair_native.cols_side, pair_py.cols_side)):
        assert len(side_n.buckets) == len(side_p.buckets)
        for bn, bp in zip(side_n.buckets, side_p.buckets):
            np.testing.assert_array_equal(bn.idx, bp.idx)
            np.testing.assert_array_equal(bn.val, bp.val)


def test_groupsort_matches_numpy():
    """key_count == bincount; stable_perm == stable argsort (ties in input
    order — the property from_coo's CSR/CSC build relies on); perm_gather
    == fancy indexing. Exercises the >=2^16 native path and the small
    NumPy-fallback path."""
    from cuda_recommender_tpu.native.groupsort import (key_count, perm_gather,
                                                       stable_perm)
    rng = np.random.default_rng(7)
    for nnz, nk in [(0, 3), (37, 5), (1 << 16, 11), (200_000, 4813)]:
        keys = rng.integers(0, nk, size=nnz).astype(np.int32)
        np.testing.assert_array_equal(
            key_count(keys, nk), np.bincount(keys, minlength=nk))
        ptr, perm = stable_perm(keys, nk)
        np.testing.assert_array_equal(perm, np.argsort(keys, kind="stable"))
        np.testing.assert_array_equal(
            ptr, np.concatenate([[0], np.cumsum(np.bincount(keys,
                                                            minlength=nk))]))
        idx = rng.integers(0, 99, size=nnz).astype(np.int32)
        val = rng.standard_normal(nnz).astype(np.float32)
        gi, gv = perm_gather(perm, idx, val)
        np.testing.assert_array_equal(gi, idx[perm])
        np.testing.assert_array_equal(gv, val[perm])


def test_from_coo_native_matches_fallback(monkeypatch):
    """The dual CSR+CSC build must be byte-identical with and without the
    native counting sort, including duplicate (row, col) entries (kept, not
    merged — reference parity)."""
    from cuda_recommender_tpu.data.sparse import from_coo
    from cuda_recommender_tpu.native import groupsort

    rng = np.random.default_rng(3)
    nnz, m, n = 70_000, 301, 57          # below the native threshold? force:
    monkeypatch.setattr(groupsort, "_NATIVE_MIN", 1)
    r = rng.integers(0, m, size=nnz).astype(np.int32)
    c = rng.integers(0, n, size=nnz).astype(np.int32)
    v = rng.standard_normal(nnz).astype(np.float32)
    r[10:20] = r[0]; c[10:20] = c[0]     # guaranteed duplicates
    A = from_coo(m, n, r, c, v)
    monkeypatch.setattr(groupsort, "available", lambda: False)
    B = from_coo(m, n, r, c, v)
    for f in ("csr_ptr", "csr_idx", "csr_val", "csc_ptr", "csc_idx",
              "csc_val"):
        np.testing.assert_array_equal(getattr(A, f), getattr(B, f))
