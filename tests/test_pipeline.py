"""Self-training pipeline driver: iteration-level resume semantics
(reference: run/pose2d/train.py:277-286 skips finished pipeline iterations
after a cluster preemption)."""

import argparse

import pytest

from posetpu.cli.pipeline import pipeline_state_path, run_pipeline
from posetpu.config import default_config


def _args(tmp_path, repeats=2, fresh=False):
    return argparse.Namespace(
        cfg="", repeats=repeats, fund=True, fresh=fresh,
        ransac=False, inliers=3, reproj_thre=10.0, confidence_thre=0.7,
        use_reproj=False, no_distortion=True, epochs=0,
    )


def _cfg(tmp_path):
    cfg = default_config()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    return cfg


def _stages(calls, die_at=None):
    def train_fn(cfg, pseudo_path, it):
        if die_at is not None and it == die_at:
            raise KeyboardInterrupt("simulated preemption")
        calls.append(("train", it, pseudo_path, bool(cfg.LOSS.USE_FUNDAMENTAL_LOSS)))
        return f"state_{it}"

    def validate_fn(cfg, state, it):
        calls.append(("validate", it))
        return f"heatmaps_{it}.h5"

    def mint_fn(cfg, heatmap_path, it):
        calls.append(("mint", it))
        return f"pseudo_{it}.h5"

    return train_fn, validate_fn, mint_fn


def test_pipeline_resumes_after_kill(tmp_path):
    cfg = _cfg(tmp_path)
    args = _args(tmp_path)

    # first run dies entering iteration 1 (iteration 0 fully complete)
    calls1 = []
    with pytest.raises(KeyboardInterrupt):
        run_pipeline(cfg, args, *_stages(calls1, die_at=1), log=lambda *_: None)
    assert ("mint", 0) in calls1

    # restart: iteration 0 is skipped, iteration 1 sees iteration 0's pseudo
    # labels, and the fund loss kicks in from iteration 1 (the --fund flag)
    calls2 = []
    out = run_pipeline(cfg, args, *_stages(calls2), log=lambda *_: None)
    its = [c[1] for c in calls2 if c[0] == "train"]
    assert its == [1], calls2
    assert calls2[0] == ("train", 1, "pseudo_0.h5", True)
    assert out == "pseudo_1.h5"


def test_pipeline_fresh_flag_restarts(tmp_path):
    cfg = _cfg(tmp_path)
    args = _args(tmp_path)
    calls = []
    run_pipeline(cfg, args, *_stages(calls), log=lambda *_: None)
    assert [c[1] for c in calls if c[0] == "train"] == [0, 1]

    # a completed run resumes to a no-op...
    calls_noop = []
    run_pipeline(cfg, args, *_stages(calls_noop), log=lambda *_: None)
    assert calls_noop == []

    # ...unless --fresh wipes the state
    args_fresh = _args(tmp_path, fresh=True)
    calls_fresh = []
    run_pipeline(cfg, args_fresh, *_stages(calls_fresh), log=lambda *_: None)
    assert [c[1] for c in calls_fresh if c[0] == "train"] == [0, 1]
    import os

    assert os.path.exists(pipeline_state_path(cfg, args))
