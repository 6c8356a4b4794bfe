"""Reference on-disk format roundtrips (data/binfmt.py)."""

import numpy as np

from cuda_recommender_tpu.data import binfmt
from cuda_recommender_tpu.data.sparse import from_coo, make_test


def test_binary_dataset_roundtrip(tmp_path, small_data):
    R, T = small_data
    d = str(tmp_path / "ds")
    binfmt.write_binary_dataset(d, R, T)
    R2, T2 = binfmt.load_binary_dataset(d)
    assert (R2.rows, R2.cols, R2.nnz) == (R.rows, R.cols, R.nnz)
    np.testing.assert_array_equal(R2.csr_ptr, R.csr_ptr)
    np.testing.assert_array_equal(R2.csr_idx, R.csr_idx)
    np.testing.assert_array_equal(R2.csr_val, R.csr_val)
    np.testing.assert_array_equal(R2.csc_ptr, R.csc_ptr)
    np.testing.assert_array_equal(T2.val, T.val)
    np.testing.assert_array_equal(T2.row_idx, T.row_idx)


def test_binary_dtypes_match_reference(tmp_path, tiny_data):
    """Byte-level parity: ptr int32, idx uint32, val float32
    (/root/reference/src/pmf_util.h:113-136)."""
    R, T = tiny_data
    d = tmp_path / "ds"
    binfmt.write_binary_dataset(str(d), R, T)
    ptr = np.fromfile(d / "csr_row_ptr.bin", dtype="<i4")
    assert ptr.shape[0] == R.rows + 1 and ptr[-1] == R.nnz
    idx = np.fromfile(d / "csr_col_idx.bin", dtype="<u4")
    assert idx.shape[0] == R.nnz
    assert (np.fromfile(d / "test_val.bin", dtype="<f4") == T.val).all()


def test_model_roundtrip_entity_major(tmp_path):
    rng = np.random.default_rng(0)
    W = rng.normal(size=(50, 8)).astype(np.float32)
    H = rng.normal(size=(30, 8)).astype(np.float32)
    p = str(tmp_path / "model")
    binfmt.save_model(p, W, H, entity_major=True)
    W2, H2 = binfmt.load_model(p, entity_major=True)
    np.testing.assert_array_equal(W, W2)
    np.testing.assert_array_equal(H, H2)
    # header layout: int64 (rows, cols) then f32 payload (tools.cpp:98-118)
    raw = np.fromfile(p, dtype="<i8", count=2)
    assert tuple(raw) == (50, 8)


def test_model_roundtrip_rank_major(tmp_path):
    """CCD rank-major factors are transposed to the entity-major file payload
    (the reference's col-major save branch, tools.cpp:110-117)."""
    rng = np.random.default_rng(1)
    W = rng.normal(size=(8, 50)).astype(np.float32)   # (k, m)
    H = rng.normal(size=(8, 30)).astype(np.float32)
    p = str(tmp_path / "model")
    binfmt.save_model(p, W, H, entity_major=False)
    We, He = binfmt.load_model(p, entity_major=True)
    np.testing.assert_array_equal(We, W.T)
    Wr, Hr = binfmt.load_model(p, entity_major=False)
    np.testing.assert_array_equal(Wr, W)
    np.testing.assert_array_equal(Hr, H)


def test_meta_text_dataset(tmp_path):
    d = tmp_path
    (d / "train.txt").write_text("1 1 4.0\n1 2 3.0\n2 1 5.0\n")
    (d / "test.txt").write_text("2 2 2.0\n")
    (d / "meta").write_text("2 2\n3 train.txt\n1 test.txt\n")
    R, T = binfmt.load_meta_text_dataset(str(d))
    assert R.rows == 2 and R.cols == 2 and R.nnz == 3
    assert T.nnz == 1 and T.row_idx[0] == 1 and T.col_idx[0] == 1
    np.testing.assert_allclose(R.to_dense(), [[4, 3], [5, 0]])
