"""End-to-end CNN-joint training through the Trainer: CSV + image TFRecord
streams composed (reference joint.py:135-139 + dataset.py:293-310), one
optimizer step per arm including 'cnn'."""

import os
import shutil

import numpy as np
import pytest

from paths import UNIT_FIXTURE as FIXTURE
# bundled image fixtures (tools/generate_sample_images.py; the reference
# ships data/image/*.jpeg + train.tfrecords — SURVEY §2.15)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TFRECORDS = os.path.join(REPO, "data", "image", "train.tfrecords")


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


@pytest.mark.slow
def test_cnn_cli_train_eval_on_bundled_images(small_conf_dir, tmp_path):
    """CLI-driven CNN-joint run over the bundled PNG->TFRecord fixtures —
    the full data path (tools/train.py + eval.py with --image_*_data)."""
    import subprocess
    import sys

    conf2 = tmp_path / "conf"
    shutil.copytree(small_conf_dir, conf2)
    text = (conf2 / "model.yaml").read_text()
    text = text.replace("cnn_use_flag: 0", "cnn_use_flag: 1")
    text = text.replace("cnn_model: vgg16", "cnn_model: resnet_cifar")
    text = text.replace("cnn_resnet_size: 50", "cnn_resnet_size: 8")
    (conf2 / "model.yaml").write_text(text)
    env = dict(os.environ, WIDE_DEEP_CONF_DIR=str(conf2),
               WDT_TEST_REEXEC="1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = ["--model_type", "wide_deep", "--model_dir", str(tmp_path / "m"),
              "--image_train_data", TFRECORDS,
              "--image_eval_data", TFRECORDS,
              "--image_test_data", TFRECORDS,
              "--batch_size", "8"]
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "train.py"),
         "--train_data", FIXTURE, "--eval_data", FIXTURE,
         "--test_data", FIXTURE, "--train_epochs", "1",
         "--keep_train", "0"] + common,
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-3000:]
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "eval.py"),
         "--test_data", FIXTURE] + common,
        capture_output=True, text=True, timeout=600, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "auc" in out.stdout and "accuracy" in out.stdout, out.stdout


def test_bundled_tfrecord_decodes(small_conf_dir):
    """The bundled train.tfrecords round-trips through the no-TF codec."""
    from wide_deep_tpu.features import tfrecord
    from wide_deep_tpu.features.image import decode_raw_image
    n = 0
    for payload in tfrecord.read_records(TFRECORDS):
        img = decode_raw_image(payload, 224, 224, 3)
        assert img.shape == (224, 224, 3)
        assert float(img.max()) <= 255.0 and float(img.min()) >= 0.0
        n += 1
    assert n == 24


class TestImageRowAlignment:
    """ImageCsvDataset pairs image k with csv row k BY INDEX — exact
    under shuffling, sharding, epoch reseeding, and the csv fast path
    (the seed-matched twin-shuffle scheme silently desynced under all of
    those; review round 5)."""

    def _mk(self, small_plan, tmp_path, n_rows=10, n_imgs=6):
        from wide_deep_tpu.features import tfrecord
        from paths import UNIT_FIXTURE
        # images: 4x4x3 with every byte == record index
        recs = [tfrecord.serialize_example(
            {"image": [bytes([k]) * (4 * 4 * 3)], "label": [k]})
            for k in range(n_imgs)]
        img_file = str(tmp_path / "imgs.tfrecords")
        tfrecord.write_records(img_file, iter(recs))
        return UNIT_FIXTURE, img_file

    def test_shuffled_batches_pair_by_index(self, small_plan, tmp_path):
        from wide_deep_tpu.features.image import ImageCsvDataset
        from wide_deep_tpu.features.pipeline import CsvDataset
        csv_file, img_file = self._mk(small_plan, tmp_path)
        n_imgs = 6
        ds = ImageCsvDataset(small_plan, csv_file, img_file, "train", 4,
                             height=4, width=4, channels=3, seed=7)
        # a fresh twin csv dataset reproduces the same deterministic
        # order, exposing each batch's original row indices
        for epoch in range(2):  # epoch 2 reshuffles; pairing must hold
            mirror = CsvDataset(small_plan, csv_file, "train", 4, seed=7)
            mirror._epoch = epoch
            got = list(ds)
            want = list(mirror.iter_with_indices())
            assert len(got) == len(want) > 1
            orders = []
            for batch, (_, idxs) in zip(got, want):
                orders.append(tuple(idxs))
                for j, idx in enumerate(idxs):
                    expect = 0.0 if idx < 0 else float(idx % n_imgs)
                    assert float(batch["image"][j, 0, 0, 0]) == expect, (
                        epoch, j, idx)
            if epoch == 0:
                first_orders = orders
        assert orders != first_orders  # epoch 2 actually reshuffled

    def test_sharded_rows_keep_their_images(self, small_plan, tmp_path):
        from wide_deep_tpu.features.image import ImageCsvDataset
        from wide_deep_tpu.features.pipeline import CsvDataset
        csv_file, img_file = self._mk(small_plan, tmp_path)
        n_imgs = 6
        ds = ImageCsvDataset(small_plan, csv_file, img_file, "eval", 4,
                             height=4, width=4, channels=3,
                             num_shards=2, shard_index=1)
        mirror = CsvDataset(small_plan, csv_file, "eval", 4,
                            num_shards=2, shard_index=1)
        for batch, (_, idxs) in zip(ds, mirror.iter_with_indices()):
            for j, idx in enumerate(idxs):
                expect = 0.0 if idx < 0 else float(idx % n_imgs)
                assert float(batch["image"][j, 0, 0, 0]) == expect
            # shard 1 sees odd original rows only
            assert all(i % 2 == 1 for i in idxs if i >= 0)
