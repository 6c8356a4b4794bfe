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


def test_bf16_checkpoint_resume(small_data, tmp_path):
    """bfloat16 training state must roundtrip through npz checkpoints
    (non-native dtypes are cast to f32 on save)."""
    R, T = small_data
    base = dict(k=4, lambda_=0.1, backend="dense", residual_dtype="bfloat16")
    full = train(Config(maxiter=3, **base), R, T)
    ck = str(tmp_path / "ck")
    train(Config(maxiter=2, checkpoint_dir=ck, checkpoint_every=2, **base), R, T)
    resumed = train(Config(maxiter=3, checkpoint_dir=ck, checkpoint_every=2,
                           **base), R, T, resume_from_checkpoint=True)
    np.testing.assert_allclose(full.W, resumed.W, atol=1e-3)


def test_backend_ref_runs_reference(small_data, capsys):
    """--backend ref must run the NumPy golden solver, not a compiled path."""
    R, T = small_data
    res = train(Config(k=4, maxiter=2, lambda_=0.1, backend="ref"), R, T)
    from cuda_recommender_tpu.core.init import init_factors_np
    from cuda_recommender_tpu.solvers.reference import ccd_reference
    W0, H0 = init_factors_np(4, R.rows, R.cols, seed=0)
    ccd_reference(R, W0, H0, T, lambda_=0.1, maxiter=2)
    np.testing.assert_array_equal(res.W, W0)     # bit-identical to golden


def test_resume_backend_mismatch_raises(small_data, tmp_path):
    R, T = small_data
    ck = str(tmp_path / "ck")
    train(Config(k=4, maxiter=1, backend="dense", checkpoint_dir=ck,
                 checkpoint_every=1), R, T)
    import pytest
    with pytest.raises(ValueError, match="incompatible"):
        train(Config(k=4, maxiter=2, backend="ell", checkpoint_dir=ck,
                     checkpoint_every=1), R, T, resume_from_checkpoint=True)


def test_resume_layout_mismatch_raises(small_data, tmp_path):
    """Resuming under a different slot-layout knob (ell_min_width) must be
    rejected: ELL payloads are only valid under the writing run's slot
    permutation, even when array shapes happen to coincide."""
    R, T = small_data
    ck = str(tmp_path / "ck")
    train(Config(k=4, maxiter=1, backend="ell", ell_min_width=8,
                 checkpoint_dir=ck, checkpoint_every=1), R, T)
    import pytest
    with pytest.raises(ValueError, match="layout mismatch"):
        train(Config(k=4, maxiter=2, backend="ell", ell_min_width=16,
                     checkpoint_dir=ck, checkpoint_every=1), R, T,
              resume_from_checkpoint=True)


def test_als_backend_request_normalizes_to_ell(small_data, capsys):
    """-ALS --backend dense|pallas must run AND report the ELL path — the
    round-1 behavior ran ELL while logging the requested backend name."""
    R, T = small_data
    res = train(Config(solver="als", k=4, maxiter=1, backend="dense"), R, T)
    assert res.backend == "ell"
    assert "Backend = ell" in capsys.readouterr().out


def test_als_iteration_line_uses_update_time_label(small_data, capsys):
    """ALS per-iteration wall time must appear under the update_time label
    with a real (nonzero) value (src/ALS.cpp:224-229 parity)."""
    R, T = small_data
    train(Config(solver="als", k=4, maxiter=1), R, T)
    out = capsys.readouterr().out
    line = next(ln for ln in out.splitlines() if ln.startswith("[-INFO-]"))
    assert "update_time" in line and "rank_time" not in line
    val = float(line.split("update_time")[1].split("|")[0])
    assert val > 0.0
