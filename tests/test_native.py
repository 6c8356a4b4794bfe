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
