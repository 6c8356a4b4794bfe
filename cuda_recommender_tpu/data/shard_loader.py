"""Host-local shard loading for multi-host training (VERDICT r2 missing #3).

The reference's binary dataset format (meta_modified_all,
/root/reference/src/tools.cpp:3-85) is trivially range-readable: the CSR/CSC
ptr arrays are tiny ((m+1) + (n+1) int32), and each entity's neighbor
idx/val live at byte offsets ptr[e]*4 .. ptr[e+1]*4 of the payload files.
A multi-host process therefore:

1. reads BOTH ptr arrays (tiny),
2. derives the full deterministic ELL layout from the degrees alone
   (data/ell.plan_ell_pair — every process computes the identical layout,
   like every run of the reference reading the same converted files),
3. range-reads ONLY the idx/val bytes of the entities its mesh shards own
   (coalescing adjacent entity ranges into single reads), and
4. fills ONLY its shards' bucket rows, handing the blocks to
   parallel.multihost.assemble_global.

No process ever materializes a full nnz-scale array — ``RangeReader``
tracks ``nnz_read`` so tests can assert it. Contiguous CSR row-range reads
(``read_csr_row_range``) serve the hybrid backend's panel blocks the same
way: a panel is rows [r0, r1) of the degree-sorted matrix, i.e. a set of
original rows each fetched by range.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from .ell import EllSide, plan_ell_pair


@dataclasses.dataclass(frozen=True)
class DatasetHeader:
    """Parsed meta_modified_all manifest (src/tools.cpp:3-30)."""

    m: int
    n: int
    nnz: int
    train_names: tuple[str, ...]   # 9 filenames, COO + CSR + CSC
    nnz_test: int
    test_names: tuple[str, ...]    # 3 filenames


def load_header(dirname: str) -> DatasetHeader:
    with open(os.path.join(dirname, "meta_modified_all")) as f:
        tokens = f.read().split()
    return DatasetHeader(
        m=int(tokens[0]), n=int(tokens[1]), nnz=int(tokens[2]),
        train_names=tuple(tokens[3:12]),
        nnz_test=int(tokens[12]), test_names=tuple(tokens[13:16]))


def load_ptrs(dirname: str, hdr: DatasetHeader | None = None
              ) -> tuple[np.ndarray, np.ndarray]:
    """The tiny part every process reads in full: (csr_ptr, csc_ptr)."""
    hdr = hdr or load_header(dirname)
    csr_ptr = np.fromfile(os.path.join(dirname, hdr.train_names[3]),
                          dtype="<i4", count=hdr.m + 1).astype(np.int64)
    csc_ptr = np.fromfile(os.path.join(dirname, hdr.train_names[6]),
                          dtype="<i4", count=hdr.n + 1).astype(np.int64)
    if csr_ptr.size != hdr.m + 1 or csc_ptr.size != hdr.n + 1:
        raise ValueError(f"short ptr read in {dirname}")
    return csr_ptr, csc_ptr


class RangeReader:
    """Coalesced range reads of one orientation's idx/val payload files.

    ``fetch(entities)`` returns a compact local CSR over exactly the
    requested entities in the requested order: (lptr, lidx, lval) with
    lidx[lptr[q]:lptr[q+1]] = the q-th entity's neighbors. Adjacent /
    overlapping entity byte ranges are merged into single reads;
    ``gap_merge`` > 0 additionally skips small holes to keep reads
    sequential — useful when the requested entities are contiguous on disk,
    wasteful under the ELL round-robin shard deal (interleaved ranges would
    merge across OTHER shards' data), hence default 0. ``nnz_read`` counts
    total neighbor entries actually read from disk — the honesty meter for
    "no process holds the full nnz arrays"."""

    def __init__(self, dirname: str, idx_name: str, val_name: str,
                 ptr: np.ndarray, *, gap_merge: int = 0):
        self.idx_path = os.path.join(dirname, idx_name)
        self.val_path = os.path.join(dirname, val_name)
        self.ptr = np.asarray(ptr, dtype=np.int64)
        self.gap_merge = int(gap_merge)
        self.nnz_read = 0
        self.reads = 0

    def _runs(self, lo: np.ndarray, hi: np.ndarray) -> list[tuple[int, int]]:
        order = np.argsort(lo, kind="stable")
        runs: list[list[int]] = []
        for s, e in zip(lo[order], hi[order]):
            if runs and s <= runs[-1][1] + self.gap_merge:
                runs[-1][1] = max(runs[-1][1], int(e))
            else:
                runs.append([int(s), int(e)])
        return [(s, e) for s, e in runs if e > s]

    def fetch(self, entities: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        ents = np.asarray(entities, dtype=np.int64)
        lo, hi = self.ptr[ents], self.ptr[ents + 1]
        deg = hi - lo
        lptr = np.concatenate([[0], np.cumsum(deg)])
        total = int(lptr[-1])
        lidx = np.empty(total, np.int32)
        lval = np.empty(total, np.float32)
        runs = self._runs(lo, hi)
        # map each run into a scratch buffer, then slice per entity
        with open(self.idx_path, "rb") as fi, open(self.val_path, "rb") as fv:
            bufs = []
            starts = np.array([s for s, _ in runs], dtype=np.int64)
            for s, e in runs:
                fi.seek(s * 4)
                bi = np.fromfile(fi, dtype="<u4", count=e - s)
                fv.seek(s * 4)
                bv = np.fromfile(fv, dtype="<f4", count=e - s)
                if bi.size != e - s or bv.size != e - s:
                    raise ValueError(f"short range read [{s},{e}) in "
                                     f"{self.idx_path}")
                bufs.append((bi, bv))
                self.nnz_read += e - s
                self.reads += 1
        for q in range(ents.size):
            if deg[q] == 0:
                continue
            r = int(np.searchsorted(starts, lo[q], side="right") - 1)
            off = int(lo[q] - starts[r])
            bi, bv = bufs[r]
            lidx[lptr[q]:lptr[q + 1]] = bi[off:off + deg[q]].astype(np.int32)
            lval[lptr[q]:lptr[q + 1]] = bv[off:off + deg[q]]
        return lptr, lidx, lval


def read_csr_row_range(dirname: str, r0: int, r1: int,
                       hdr: DatasetHeader | None = None
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One contiguous CSR row block [r0, r1): (local_ptr, col_idx, val) via
    a single range read per payload file — the hybrid backend's panel rows
    (contiguous in the DEGREE-SORTED space map to scattered original rows;
    use RangeReader for those. This covers pre-sorted / blocked layouts)."""
    hdr = hdr or load_header(dirname)
    csr_ptr, _ = load_ptrs(dirname, hdr)
    lo, hi = int(csr_ptr[r0]), int(csr_ptr[r1])
    with open(os.path.join(dirname, hdr.train_names[4]), "rb") as f:
        f.seek(lo * 4)
        idx = np.fromfile(f, dtype="<u4", count=hi - lo).astype(np.int32)
    with open(os.path.join(dirname, hdr.train_names[5]), "rb") as f:
        f.seek(lo * 4)
        val = np.fromfile(f, dtype="<f4", count=hi - lo)
    if idx.size != hi - lo or val.size != hi - lo:
        raise ValueError(f"short row-range read [{r0},{r1}) in {dirname}")
    return csr_ptr[r0:r1 + 1] - lo, idx, val


def fill_local_bucket_blocks(side: EllSide, grids, shard_ids,
                             reader: RangeReader,
                             other_slot_of_entity: np.ndarray,
                             other_zero_slot: int) -> list[list[tuple]]:
    """Fill ONLY the bucket rows of ``shard_ids`` from range reads.

    Returns, per bucket, one (idx_block, val_block) pair per requested
    shard, each shaped (rows_per_shard, L) — exactly the per-device blocks
    ``parallel.multihost.assemble_global`` wants (bucket arrays are
    shard-major on axis 0). Same fill semantics as data/ell._fill_side."""
    out = []
    for b, grid in zip(side.buckets, grids):
        blocks = []
        for s in shard_ids:
            ids = np.asarray(grid[s])
            idxb = np.full((b.rows_per_shard, b.L), other_zero_slot,
                           np.int32)
            valb = np.zeros((b.rows_per_shard, b.L), np.float32)
            valid = np.where(ids >= 0)[0]
            lptr, lidx, lval = reader.fetch(ids[valid])
            for q, j in enumerate(valid):
                d = int(lptr[q + 1] - lptr[q])
                r, c0 = int(j) // b.p, (int(j) % b.p) * b.E
                sl = slice(lptr[q], lptr[q + 1])
                idxb[r, c0:c0 + d] = other_slot_of_entity[lidx[sl]]
                valb[r, c0:c0 + d] = lval[sl]
            blocks.append((idxb, valb))
        out.append(blocks)
    return out


@dataclasses.dataclass(frozen=True)
class LocalEllShards:
    """One process's host-local view of the sharded ELL dataset."""

    rows_side: EllSide             # geometry only (buckets hold (0, L))
    cols_side: EllSide
    #: per bucket, per owned shard: (idx_block, val_block), shard-major
    rows_blocks: list[list[tuple]]
    cols_blocks: list[list[tuple]]
    shard_ids: list[int]
    nnz_read: int                  # neighbor entries this process read


def load_local_ell_shards(dirname: str, num_shards: int,
                          shard_ids: list[int], *, min_width: int = 8,
                          index_space: str = "slot") -> LocalEllShards:
    """The full host-local pipeline: header + ptrs (tiny) -> deterministic
    layout -> range-read + fill only ``shard_ids``'s bucket rows."""
    hdr = load_header(dirname)
    csr_ptr, csc_ptr = load_ptrs(dirname, hdr)
    rows_side, cols_side, rgrids, cgrids = plan_ell_pair(
        csr_ptr, csc_ptr, hdr.m, hdr.n, min_width=min_width,
        num_shards=num_shards)
    if index_space == "entity":
        rmap = np.arange(hdr.n, dtype=np.int32)
        cmap = np.arange(hdr.m, dtype=np.int32)
        rzero, czero = hdr.n, hdr.m
    elif index_space == "slot":
        rmap, cmap = cols_side.slot_of_entity, rows_side.slot_of_entity
        rzero, czero = cols_side.n_slots, rows_side.n_slots
    else:
        raise ValueError(f"index_space must be 'slot' or 'entity', "
                         f"got {index_space!r}")
    r_reader = RangeReader(dirname, hdr.train_names[4], hdr.train_names[5],
                           csr_ptr)
    c_reader = RangeReader(dirname, hdr.train_names[7], hdr.train_names[8],
                           csc_ptr)
    rows_blocks = fill_local_bucket_blocks(rows_side, rgrids, shard_ids,
                                           r_reader, rmap, rzero)
    cols_blocks = fill_local_bucket_blocks(cols_side, cgrids, shard_ids,
                                           c_reader, cmap, czero)
    return LocalEllShards(
        rows_side=rows_side, cols_side=cols_side,
        rows_blocks=rows_blocks, cols_blocks=cols_blocks,
        shard_ids=list(shard_ids),
        nnz_read=r_reader.nnz_read + c_reader.nnz_read)
