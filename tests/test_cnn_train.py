"""End-to-end CNN-joint training through the Trainer: CSV + image TFRecord
streams composed (reference joint.py:135-139 + dataset.py:293-310), one
optimizer step per arm including 'cnn'."""

import os
import shutil

import numpy as np
import pytest

FIXTURE = "/root/reference/data/test/test2"
TFRECORDS = "/root/reference/data/image/train.tfrecords"


@pytest.mark.slow
def test_joint_cnn_training(small_conf_dir, tmp_path):
    conf2 = tmp_path / "conf"
    shutil.copytree(small_conf_dir, conf2)
    text = (conf2 / "model.yaml").read_text()
    text = text.replace("cnn_use_flag: 0", "cnn_use_flag: 1")
    text = text.replace("cnn_model: vgg16", "cnn_model: resnet_cifar")
    text = text.replace("cnn_resnet_size: 50", "cnn_resnet_size: 8")
    (conf2 / "model.yaml").write_text(text)

    from wide_deep_tpu.config import Config
    from wide_deep_tpu.training.loop import Trainer
    config = Config(str(conf2))
    tr = Trainer(config, model_type="wide_deep",
                 model_dir=str(tmp_path / "m"),
                 overrides=dict(train_data=FIXTURE, eval_data=FIXTURE,
                                test_data=FIXTURE,
                                image_train_data=TFRECORDS,
                                image_eval_data=TFRECORDS,
                                image_test_data=TFRECORDS,
                                keep_train=True, batch_size=8))
    assert tr.model.has_cnn
    tr.ensure_initialized(restore=False)
    assert "cnn" in tr.params and "cnn_bn" in tr.mstate
    cnn_before = np.asarray(
        tr.params["cnn"]["resnet"]["init"]["kernel"]).copy()
    loss = tr.train_file(FIXTURE)
    assert np.isfinite(loss)
    # the cnn arm actually trained (its optimizer partition received grads)
    cnn_after = np.asarray(tr.params["cnn"]["resnet"]["init"]["kernel"])
    assert not np.allclose(cnn_before, cnn_after)
    res = tr.evaluate(FIXTURE)
    assert np.isfinite(res["loss"])
