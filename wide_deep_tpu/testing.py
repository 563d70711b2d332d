"""Test/dry-run helpers: scaled-down configs with full structural coverage.

Used by tests/conftest.py and __graft_entry__.dryrun_multichip to exercise
every feature/model/sharding path with tiny table shapes (hash spaces capped,
small hidden layers) so CPU meshes stay cheap while the *structure* — all
transforms, all crosses, all arms — matches the production config.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_small_conf(dst_dir: str,
                     hash_cap: int = 1000,
                     cross_cap_k: int = 5,
                     hidden_units: str = "[32, 16]",
                     batch_size: int = 16,
                     num_examples: int = 100) -> str:
    """Copy conf/ into ``dst_dir`` with shrunken table sizes; returns path."""
    src = os.path.join(REPO_ROOT, "conf")
    os.makedirs(dst_dir, exist_ok=True)
    for name in os.listdir(src):
        shutil.copy(os.path.join(src, name), os.path.join(dst_dir, name))

    def rewrite(name, fn):
        path = os.path.join(dst_dir, name)
        with open(path) as f:
            text = f.read()
        with open(path, "w") as f:
            f.write(fn(text))

    rewrite("feature.yaml", lambda t: re.sub(
        r"parameter: (\d{4,})\b", f"parameter: {hash_cap}", t))
    rewrite("cross_feature.yaml", lambda t: re.sub(
        r"hash_bucket_size: (\d+)",
        lambda m: f"hash_bucket_size: {min(int(m.group(1)), cross_cap_k)}", t))
    rewrite("model.yaml", lambda t: t.replace(
        "dnn_hidden_units: [1024, 512, 256]",
        f"dnn_hidden_units: {hidden_units}").replace(
        "embedding_dtype: bfloat16", "embedding_dtype: float32"))
    rewrite("train.yaml", lambda t: t.replace(
        "batch_size: 64", f"batch_size: {batch_size}").replace(
        "num_examples: 10000", f"num_examples: {num_examples}").replace(
        # pinned budget: tests need stable pool layouts regardless of which
        # fixture a Trainer points at (auto sizes from the data)
        "pack_budget: auto", "pack_budget: 3").replace(
        # pinned lookup: the default `auto` resolves to the explicit
        # exchange on the virtual 8-device test mesh, which would silently
        # reroute every default-Trainer test; exchange tests opt in
        "sharded_lookup: auto", "sharded_lookup: gspmd"))
    return dst_dir


def small_config(dst_dir: str | None = None, **kwargs):
    from wide_deep_tpu.config import Config
    if dst_dir is None:
        dst_dir = tempfile.mkdtemp(prefix="wdt_conf_")
    return Config(write_small_conf(dst_dir, **kwargs))
