"""Trainer loop-mode coverage: train_and_eval, dynamic_train, plain train
(reference train.py:65-148,196-214 semantics)."""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_DIR = os.path.join(REPO, "data", "train")
EVAL = os.path.join(REPO, "data", "eval", "eval1")


def _trainer(small_config, tmp_path, **over):
    from wide_deep_tpu.training.loop import Trainer
    overrides = dict(train_data=TRAIN_DIR, eval_data=EVAL, test_data=EVAL,
                     keep_train=True, batch_size=64, train_epochs=1,
                     epochs_per_eval=1, num_examples=500)
    overrides.update(over)
    return Trainer(small_config, model_type="wide_deep",
                   model_dir=str(tmp_path), overrides=overrides)


def test_train_and_eval_mode(small_config, tmp_path, caplog):
    import logging
    tr = _trainer(small_config, tmp_path)
    with caplog.at_level(logging.INFO, "wide_deep_tpu"):
        tr.train_and_eval()
    msgs = [r.message for r in caplog.records]
    # per-file eval + end-of-epoch test eval (train.py:94-106)
    assert any("eval train1" in m for m in msgs)
    assert any("epoch 0 test" in m for m in msgs)
    # both train files consumed
    assert tr.global_step >= 2 * (2000 // 64)


def test_dynamic_train_mode(small_config, tmp_path, caplog):
    import logging
    tr = _trainer(small_config, tmp_path)
    with caplog.at_level(logging.INFO, "wide_deep_tpu"):
        tr.dynamic_train()
    msgs = [r.message for r in caplog.records]
    # rolling window: after train1, evaluate on train2 (train.py:109-148)
    assert any("dynamic eval on train2" in m for m in msgs)
    # but never beyond the last file
    assert not any("dynamic eval on train1" in m for m in msgs)


def test_plain_train_mode(small_config, tmp_path):
    tr = _trainer(small_config, tmp_path)
    tr.train()
    assert tr.global_step > 0
    # checkpoint written at end of epoch
    assert tr._ckpt.latest_step() == tr.global_step


def test_maybe_wipe_model_dir(small_config, tmp_path):
    tr = _trainer(small_config, tmp_path, keep_train=False)
    os.makedirs(tr.model_dir, exist_ok=True)
    marker = os.path.join(tr.model_dir, "marker")
    open(marker, "w").close()
    tr.maybe_wipe_model_dir()
    assert not os.path.exists(marker)  # keep_train=0 wipes (train.py:188-191)
    tr2 = _trainer(small_config, tmp_path, keep_train=True)
    os.makedirs(tr2.model_dir, exist_ok=True)
    open(os.path.join(tr2.model_dir, "marker"), "w").close()
    tr2.maybe_wipe_model_dir()
    assert os.path.exists(os.path.join(tr2.model_dir, "marker"))