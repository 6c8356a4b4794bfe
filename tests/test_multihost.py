"""Multi-host plumbing on the 8-virtual-device CPU mesh (single process —
the make_array_from_single_device_arrays path is identical under real
multi-process jax.distributed, where each host supplies only its blocks)."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from cuda_recommender_tpu.parallel import multihost
from cuda_recommender_tpu.parallel.mesh import make_mesh


def test_initialize_noop_single_process():
    multihost.initialize()          # no coordinator configured -> no-op


def test_local_shard_ids_single_process():
    mesh = make_mesh()
    assert multihost.local_shard_ids(mesh) == list(range(8))


def test_assemble_global_roundtrip():
    mesh = make_mesh()
    full = np.arange(8 * 6 * 4, dtype=np.float32).reshape(48, 4)
    blocks = multihost.shard_rows_for_process(full, mesh)
    arr = multihost.assemble_global(blocks, mesh, P("d", None), full.shape)
    assert arr.shape == full.shape
    np.testing.assert_array_equal(np.asarray(arr), full)
    # sharded compute over the assembled array sees the right blocks
    s = jax.jit(lambda x: x.sum())(arr)
    assert float(s) == full.sum()


def test_assemble_global_wrong_count():
    mesh = make_mesh()
    try:
        multihost.assemble_global([np.zeros((6, 4), np.float32)], mesh,
                                  P("d", None), (48, 4))
    except ValueError as e:
        assert "local blocks" in str(e)
    else:
        raise AssertionError("expected ValueError")
