"""Checkpointer unit behavior: atomicity artifacts, GC, manifest, extras."""

import os

import numpy as np

from cuda_recommender_tpu.core.checkpoint import Checkpointer


def test_save_latest_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path))
    W = np.arange(6, dtype=np.float32).reshape(2, 3)
    H = np.ones((4, 3), np.float32)
    ck.save(1, W=W, H=H, solver="ccd", backend="dense",
            extra={"Rhat": np.zeros((2, 2), np.float32)})
    latest = ck.latest()
    assert latest["oiter"] == 1 and latest["solver"] == "ccd"
    np.testing.assert_array_equal(latest["W"], W)
    assert "Rhat" in latest["extra"]


def test_gc_keeps_last_n(tmp_path):
    ck = Checkpointer(str(tmp_path), keep=2)
    for i in range(1, 6):
        ck.save(i, W=np.zeros((1, 1)), H=np.zeros((1, 1)),
                solver="ccd", backend="dense")
    snaps = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
    assert snaps == ["ckpt_000004.npz", "ckpt_000005.npz"]
    assert ck.latest()["oiter"] == 5


def test_latest_none_when_empty(tmp_path):
    assert Checkpointer(str(tmp_path)).latest() is None


def test_no_tmp_leftovers(tmp_path):
    ck = Checkpointer(str(tmp_path))
    ck.save(3, W=np.zeros((1, 1)), H=np.zeros((1, 1)),
            solver="als", backend="ell")
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
