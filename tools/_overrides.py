"""Shared TRAIN_OVERRIDES parsing for the tools/ launchers.

Comma-separated dotted config overrides, e.g.
``TRAIN_OVERRIDES="model.reuse_cond_emb=True,model.scan_unroll=2"``.
Values are Python literals (True / 2 / 0.5 / 'dots'); anything that fails
literal evaluation is kept as a string.
"""

import os


def apply_env_overrides(cfg, env_var: str = "TRAIN_OVERRIDES") -> None:
    for ov in filter(None, os.environ.get(env_var, "").split(",")):
        path, _, raw = ov.partition("=")
        node = cfg
        keys = path.strip().split(".")
        for k in keys[:-1]:
            node = getattr(node, k)
        try:
            val = eval(raw, {}, {})  # literals only
        except Exception:
            val = raw
        setattr(node, keys[-1], val)
        print(f"override: {path.strip()} = {val!r}", flush=True)
