"""Shared TRAIN_OVERRIDES parsing for the tools/ launchers.

Comma-separated dotted config overrides, e.g.
``TRAIN_OVERRIDES="model.reuse_cond_emb=True,model.scan_unroll=2"``.
Values are Python literals (True / 2 / 0.5 / 'dots' / (20, 50, 50)); a
value that fails literal evaluation is kept as a string. Entries are split
only at commas followed by a ``dotted.key=`` pattern, so tuple/list values
containing commas survive.
"""

import ast
import os
import re

_ENTRY_SPLIT = re.compile(r",(?=\s*[A-Za-z_][\w.]*\s*=)")


def apply_env_overrides(cfg, env_var: str = "TRAIN_OVERRIDES") -> None:
    raw_env = os.environ.get(env_var, "").strip()
    if not raw_env:
        return
    for ov in filter(None, (s.strip() for s in _ENTRY_SPLIT.split(raw_env))):
        path, _, raw = ov.partition("=")
        node = cfg
        keys = path.strip().split(".")
        for k in keys[:-1]:
            node = getattr(node, k)
        try:
            val = ast.literal_eval(raw.strip())
        except Exception:
            val = raw.strip()
        setattr(node, keys[-1], val)
        print(f"override: {path.strip()} = {val!r}", flush=True)
