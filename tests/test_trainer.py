"""Trainer orchestration: golden dual-run, checkpoints, resume, metrics."""

import json

import numpy as np

from cuda_recommender_tpu.core.config import Config
from cuda_recommender_tpu.core.metrics_log import MetricsLog
from cuda_recommender_tpu.core.trainer import train


def test_train_golden_ccd(small_data, tmp_path, capsys):
    R, T = small_data
    cfg = Config(k=5, maxiter=2, lambda_=0.1, golden=True, backend="dense",
                 metrics_file=str(tmp_path / "metrics.jsonl"))
    res = train(cfg, R, T)
    assert res.golden_W.passed and res.golden_H.passed
    assert res.final_rmse < 1.0
    assert abs(res.final_rmse - res.stats[-1].rmse) < 1e-4
    out = capsys.readouterr().out
    assert "Check... PASS!" in out
    assert "[-INFO-] iteration num 1" in out
    recs = [json.loads(line) for line in
            open(tmp_path / "metrics.jsonl").read().splitlines()]
    kinds = {r["kind"] for r in recs}
    assert {"info", "iteration", "golden"} <= kinds


def test_train_golden_als(small_data):
    R, T = small_data
    cfg = Config(solver="als", k=5, maxiter=2, lambda_=0.1, golden=True)
    res = train(cfg, R, T)
    assert res.golden_W.error_percentage < 1.0
    assert res.golden_H.error_percentage < 1.0


def test_checkpoint_resume_equivalence(small_data, tmp_path):
    """Train 4 iters straight vs 2 iters -> resume -> 2 more: identical
    factors (CCD residual state roundtrips through the checkpoint)."""
    R, T = small_data
    base = dict(k=4, lambda_=0.1, backend="dense")
    full = train(Config(maxiter=4, **base), R, T)

    ck = str(tmp_path / "ck")
    cfg_a = Config(maxiter=2, checkpoint_dir=ck, checkpoint_every=1, **base)
    train(cfg_a, R, T)
    cfg_b = Config(maxiter=4, checkpoint_dir=ck, checkpoint_every=1, **base)
    resumed = train(cfg_b, R, T, resume_from_checkpoint=True)
    np.testing.assert_allclose(full.W, resumed.W, atol=1e-6)
    np.testing.assert_allclose(full.H, resumed.H, atol=1e-6)
    assert [s.oiter for s in resumed.stats] == [3, 4]


def test_checkpoint_resume_ell(small_data, tmp_path):
    R, T = small_data
    base = dict(k=4, lambda_=0.1, backend="ell")
    full = train(Config(maxiter=3, **base), R, T)
    ck = str(tmp_path / "ck")
    train(Config(maxiter=2, checkpoint_dir=ck, checkpoint_every=2, **base), R, T)
    resumed = train(Config(maxiter=3, checkpoint_dir=ck, checkpoint_every=2,
                           **base), R, T, resume_from_checkpoint=True)
    np.testing.assert_allclose(full.W, resumed.W, atol=1e-6)
    np.testing.assert_allclose(full.H, resumed.H, atol=1e-6)


def test_metrics_log_silent(tmp_path, capsys):
    log = MetricsLog(str(tmp_path / "m.jsonl"), echo=False)
    log.iteration("ccd", "dense", 1, 0.9, 0.1, 0.1)
    log.close()
    assert capsys.readouterr().out == ""
    assert json.loads(open(tmp_path / "m.jsonl").readline())["rmse"] == 0.9
