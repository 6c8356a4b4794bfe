"""Host-local shard loader (data/shard_loader.py): the range-read fill must
reproduce the in-memory build_ell_pair blocks byte-for-byte, and no consumer
may read more than its shards' entities' neighbors."""

import numpy as np
import pytest

from cuda_recommender_tpu.data.binfmt import write_binary_dataset
from cuda_recommender_tpu.data.datasets import synthetic
from cuda_recommender_tpu.data.ell import build_ell_pair
from cuda_recommender_tpu.data.shard_loader import (
    RangeReader, load_header, load_local_ell_shards, load_ptrs,
    read_csr_row_range)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    R, T = synthetic(m=200, n=90, nnz=4000, seed=3)
    d = tmp_path_factory.mktemp("binds") / "data"
    write_binary_dataset(str(d), R, T)
    return str(d), R, T


def test_header_and_ptrs(dataset):
    d, R, _ = dataset
    hdr = load_header(d)
    assert (hdr.m, hdr.n, hdr.nnz) == (R.rows, R.cols, R.nnz)
    csr_ptr, csc_ptr = load_ptrs(d, hdr)
    np.testing.assert_array_equal(csr_ptr, R.csr_ptr)
    np.testing.assert_array_equal(csc_ptr, R.csc_ptr)


def test_range_reader_matches_memory(dataset):
    d, R, _ = dataset
    hdr = load_header(d)
    rd = RangeReader(d, hdr.train_names[4], hdr.train_names[5], R.csr_ptr,
                     gap_merge=0)
    ents = np.array([5, 3, 150, 151, 0, 199])
    lptr, lidx, lval = rd.fetch(ents)
    for q, e in enumerate(ents):
        lo, hi = R.csr_ptr[e], R.csr_ptr[e + 1]
        np.testing.assert_array_equal(lidx[lptr[q]:lptr[q + 1]],
                                      R.csr_idx[lo:hi])
        np.testing.assert_array_equal(lval[lptr[q]:lptr[q + 1]],
                                      R.csr_val[lo:hi])
    assert rd.nnz_read == int(lptr[-1])    # gap_merge=0: exact-share reads


def test_read_csr_row_range(dataset):
    d, R, _ = dataset
    lptr, idx, val = read_csr_row_range(d, 40, 60)
    lo, hi = R.csr_ptr[40], R.csr_ptr[60]
    np.testing.assert_array_equal(idx, R.csr_idx[lo:hi])
    np.testing.assert_array_equal(val, R.csr_val[lo:hi])
    np.testing.assert_array_equal(lptr, R.csr_ptr[40:61] - lo)


@pytest.mark.parametrize("index_space", ["slot", "entity"])
@pytest.mark.parametrize("shard_ids", [[0, 1, 2, 3], [4, 5, 6, 7]])
def test_local_blocks_match_full_build(dataset, index_space, shard_ids):
    d, R, _ = dataset
    n_dev = 8
    full = build_ell_pair(R, min_width=8, num_shards=n_dev,
                          index_space=index_space)
    shards = load_local_ell_shards(d, n_dev, shard_ids, min_width=8,
                                   index_space=index_space)
    # identical deterministic geometry
    for side_l, side_f in ((shards.rows_side, full.rows_side),
                           (shards.cols_side, full.cols_side)):
        assert side_l.slots_per_shard == side_f.slots_per_shard
        np.testing.assert_array_equal(side_l.slot_of_entity,
                                      side_f.slot_of_entity)
        assert [(b.E, b.p, b.rows_per_shard) for b in side_l.buckets] == \
               [(b.E, b.p, b.rows_per_shard) for b in side_f.buckets]
    # block content identical to the full build's shard rows
    for blocks, side_f in ((shards.rows_blocks, full.rows_side),
                           (shards.cols_blocks, full.cols_side)):
        for b_i, b in enumerate(side_f.buckets):
            for q, s in enumerate(shard_ids):
                sl = slice(s * b.rows_per_shard, (s + 1) * b.rows_per_shard)
                np.testing.assert_array_equal(blocks[b_i][q][0], b.idx[sl])
                np.testing.assert_array_equal(blocks[b_i][q][1], b.val[sl])
    # honesty: reads are EXACTLY its own shards' entities' neighbors — the
    # per-shard slot_nnz totals — not one entry more (gap_merge=0 default)
    expected = 0
    for side in (full.rows_side, full.cols_side):
        for s in shard_ids:
            sl = slice(s * side.slots_per_shard, (s + 1) * side.slots_per_shard)
            expected += int(side.slot_nnz[sl].sum())
    assert shards.nnz_read == expected
    assert shards.nnz_read < 2 * R.nnz          # strictly partial
