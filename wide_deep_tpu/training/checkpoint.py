"""Checkpoint save / resume / inspect on top of orbax.

The reference delegated checkpointing to tf.estimator's RunConfig
(/root/reference/conf/train.yaml:91-98: save every 1800 s, keep 5, keep one
per hour) and shipped an inspector CLI
(python/lib/utils/inspect_checkpoint.py:31-60).  Same semantics here:
time- or step-based cadence, bounded retention, optional keep-every-n-hours,
resume-from-latest, explicit checkpoint_path override, and a tensor
inspector (tools/inspect_checkpoint.py).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Cadenced orbax manager bound to a model directory."""

    def __init__(self, model_dir: str, runconfig: Dict[str, Any]):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self.save_secs = runconfig.get("save_checkpoints_secs")
        self.save_steps = runconfig.get("save_checkpoints_steps")
        keep_hours = runconfig.get("keep_checkpoint_every_n_hours")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=runconfig.get("keep_checkpoint_max", 5) or None,
            keep_time_interval=(datetime.timedelta(hours=keep_hours)
                                if keep_hours and keep_hours < 10000 else None),
            create=True,
            # async: save() returns once values are copied to host; the
            # disk write overlaps training (the next save/restore/close
            # waits for it).  Matters at production shapes — the d32
            # fused table is a multi-GB leaf (ARCHITECTURE.md round-3 log)
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.model_dir, options=options)
        self._last_save_time = time.time()
        self._last_save_step = -1

    def should_save(self, step: int) -> bool:
        if step == self._last_save_step:
            return False
        if self.save_steps:
            return step % self.save_steps == 0
        if self.save_secs:
            return time.time() - self._last_save_time >= self.save_secs
        return False

    def save(self, step: int, tree: Dict[str, Any], force: bool = False):
        # one async write in flight at a time; the device->host copy is
        # synchronous inside mgr.save, so mutating the live tree after
        # return is safe while the previous write commits in background
        self._mgr.wait_until_finished()
        if step in (self._mgr.all_steps() or []):
            return  # this step is already persisted
        self._mgr.save(step, args=ocp.args.StandardSave(tree),
                       force=force)
        if force:
            # Forced saves (end of training, SIGINT, explicit user save)
            # must be durable on return: block until the write commits and
            # retention finalizes, so a crash right after save() cannot
            # lose the newest step.  Only cadenced in-loop saves overlap
            # training (keep_checkpoint_max then counts the N most recent
            # *committed* steps — the in-flight one lands as N+1'th and
            # eviction runs at finalize, matching the reference's
            # keep-N-completed semantics, conf/train.yaml:94-97).
            self._mgr.wait_until_finished()
        self._last_save_time = time.time()
        self._last_save_step = step

    def wait(self):
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def all_steps(self):
        self._mgr.wait_until_finished()
        return list(self._mgr.all_steps() or [])

    def restore(self, tree: Dict[str, Any],
                step: Optional[int] = None) -> Optional[Dict[str, Any]]:
        """Restore into the structure/shardings of ``tree`` (the live target
        whose leaf shardings are preserved). Returns None when no checkpoint
        exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None

        def _abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x

        abstract = jax.tree.map(_abstract, tree)
        self._mgr.wait_until_finished()
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def inspect_checkpoint(model_dir: str, step: Optional[int] = None,
                       tensor_name: Optional[str] = None,
                       print_values: bool = False) -> Dict[str, Any]:
    """List (and optionally print) tensors in a checkpoint
    (inspect_checkpoint.py:31-60 parity)."""
    mgr = ocp.CheckpointManager(os.path.abspath(model_dir))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {model_dir}")
    tree = mgr.restore(step)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        flat[name] = leaf
    out = {}
    for name, leaf in sorted(flat.items()):
        if tensor_name and tensor_name not in name:
            continue
        arr = np.asarray(leaf)
        out[name] = arr
        if print_values:
            print(f"{name}  shape={arr.shape} dtype={arr.dtype}")
            print(arr)
        else:
            print(f"{name}  shape={arr.shape} dtype={arr.dtype}")
    mgr.close()
    return out
