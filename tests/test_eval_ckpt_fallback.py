"""tools/tpu_eval_10k.resolve_ckpt: the staged eval pipeline must find an
evaluable checkpoint even when a campaign died before its first numbered
snapshot (only the 5k-cadence meta checkpoint exists)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "tpu_eval_10k", os.path.join(REPO, "tools", "tpu_eval_10k.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_requested_ckpt_wins_when_present(tmp_path):
    mod = _load()
    (tmp_path / "checkpoints" / "checkpoint_20").mkdir(parents=True)
    assert mod.resolve_ckpt(str(tmp_path), 20) == 20


def test_falls_back_to_latest_numbered(tmp_path):
    mod = _load()
    (tmp_path / "checkpoints" / "checkpoint_24").mkdir(parents=True)
    (tmp_path / "checkpoints" / "checkpoint_25").mkdir(parents=True)
    # orbax in-progress tmp dir must not win
    (tmp_path / "checkpoints" / "checkpoint_30.orbax-checkpoint-tmp-99").mkdir()
    assert mod.resolve_ckpt(str(tmp_path), 26) == 25


def test_materializes_meta_when_no_numbered(tmp_path):
    mod = _load()
    meta = tmp_path / "checkpoints-meta" / "checkpoint"
    meta.mkdir(parents=True)
    (meta / "weights.bin").write_bytes(b"x" * 8)
    assert mod.resolve_ckpt(str(tmp_path), 26) == 26
    dst = tmp_path / "checkpoints" / "checkpoint_26"
    assert (dst / "weights.bin").read_bytes() == b"x" * 8


def test_no_checkpoints_at_all_returns_request(tmp_path):
    # run_lib then raises its usual FileNotFoundError — nothing to mask
    mod = _load()
    assert mod.resolve_ckpt(str(tmp_path), 26) == 26
