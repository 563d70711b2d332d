"""CNN arm tests: VGG/ResNet shapes, joint integration, image pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wide_deep_tpu.features import tfrecord
from wide_deep_tpu.features.image import (ImageDataset, decode_raw_image,
                                          preprocess_custom, preprocess_vgg)
from wide_deep_tpu.models.cnn import CnnSpec, cnn_logits, init_cnn_params
from wide_deep_tpu.models.cnn.vgg import save_npy_weights, load_npy_weights, var_count
from wide_deep_tpu.models.deep import ParamStore

from paths import IMAGE_TFRECORDS as REF_TFRECORDS


class TestTfrecord:
    def test_reads_reference_file(self):
        recs = list(tfrecord.read_records(REF_TFRECORDS, verify=True))
        assert len(recs) == 24
        ex = tfrecord.parse_example(recs[0])
        assert len(ex["image"][0]) == 224 * 224 * 3

    def test_roundtrip(self, tmp_path):
        ser = tfrecord.serialize_example(
            {"image": [b"\x01\x02"], "label": [3], "score": [0.25]})
        path = str(tmp_path / "t.tfrecords")
        tfrecord.write_records(path, iter([ser] * 3))
        recs = list(tfrecord.read_records(path, verify=True))
        assert len(recs) == 3
        back = tfrecord.parse_example(recs[0])
        assert back["image"][0] == b"\x01\x02"
        assert back["label"] == [3]
        np.testing.assert_allclose(back["score"], [0.25])


class TestPreprocessing:
    def test_custom_standardizes(self):
        rng = np.random.default_rng(0)
        img = rng.random((32, 32, 3)).astype(np.float32) * 255
        out = preprocess_custom(img, rng, is_training=False)
        assert abs(out.mean()) < 1e-4
        assert abs(out.std() - 1.0) < 1e-2

    def test_vgg_shape_and_mean(self):
        rng = np.random.default_rng(0)
        img = np.full((300, 400, 3), 128.0, np.float32)
        out = preprocess_vgg(img, rng, is_training=False)
        assert out.shape == (224, 224, 3)
        # mean-subtracted constant image
        np.testing.assert_allclose(
            out[0, 0], 128.0 - np.array([123.68, 116.78, 103.94]), atol=0.5)

    def test_image_dataset_batches(self):
        ds = ImageDataset(REF_TFRECORDS, "eval", batch_size=10)
        batches = list(ds)
        assert batches[0].shape == (10, 224, 224, 3)
        assert sum(1 for _ in batches) == 3  # 24 images -> 3 batches of 10


class TestResNet:
    @pytest.mark.parametrize("size", [20, 32])
    def test_cifar_variant(self, size):
        spec = CnnSpec(model="resnet_cifar", resnet_size=size, height=32,
                       width=32)
        images = np.random.default_rng(0).random((4, 32, 32, 3)).astype(
            np.float32)
        params, state = init_cnn_params(jax.random.PRNGKey(0), spec, 1,
                                        images)
        logits, new_state = cnn_logits(params, spec, jnp.asarray(images), 1,
                                       False, state)
        assert logits.shape == (4, 1)
        assert np.isfinite(np.asarray(logits)).all()

    def test_imagenet_sizes_table(self):
        from wide_deep_tpu.models.cnn.resnet import IMAGENET_SIZES
        assert set(IMAGENET_SIZES) == {18, 34, 50, 101, 152, 200}
        # shape-only trace of resnet-18 (no FLOPs)
        spec = CnnSpec(model="resnet", resnet_size=18, height=64, width=64)
        images = jnp.zeros((2, 64, 64, 3), jnp.float32)
        params, state = jax.eval_shape(
            lambda r: init_cnn_params(r, spec, 1, images),
            jax.random.PRNGKey(0))
        assert params  # params tree materialized abstractly

    def test_bad_size_rejected(self):
        spec = CnnSpec(model="resnet", resnet_size=17)
        with pytest.raises(ValueError, match="resnet_size"):
            init_cnn_params(jax.random.PRNGKey(0), spec, 1,
                            jnp.zeros((1, 64, 64, 3)))


class TestVgg:
    def test_vgg16_shapes_abstract(self):
        # eval_shape: full VGG16 param/shape audit without compute
        from wide_deep_tpu.models.cnn.vgg import vgg_features
        params = {}
        images = jnp.zeros((2, 224, 224, 3), jnp.float32)

        def init(rng):
            store = ParamStore(params, create=True, rng=rng)
            return vgg_features(store, images, 16)

        out = jax.eval_shape(init, jax.random.PRNGKey(0))
        assert out.shape == (2, 1000)
        assert params["vgg"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
        assert params["vgg"]["fc6"]["kernel"].shape == (25088, 4096)
        # VGG16 has 13 conv + 3 fc layers
        assert len(params["vgg"]) == 16

    def test_npy_roundtrip(self, tmp_path):
        params = {"vgg": {"conv1_1": {
            "kernel": jnp.ones((3, 3, 3, 4)), "bias": jnp.zeros(4)}}}
        path = str(tmp_path / "w.npy")
        save_npy_weights(params, path)
        params2 = {"vgg": {"conv1_1": {
            "kernel": jnp.zeros((3, 3, 3, 4)), "bias": jnp.ones(4)}}}
        load_npy_weights(params2, path)
        np.testing.assert_array_equal(
            np.asarray(params2["vgg"]["conv1_1"]["kernel"]), 1.0)
        assert var_count(params) == 3 * 3 * 3 * 4 + 4


class TestJointWithCnn:
    def test_wide_deep_cnn(self, small_config, small_plan, fixture_rows):
        from wide_deep_tpu.features.pipeline import FeatureTransformer
        from wide_deep_tpu.models.joint import WideDeep
        from wide_deep_tpu.models.deep import DeepSpec, TowerSpec
        tr = FeatureTransformer(small_plan)
        batch = {k: jnp.asarray(v)
                 for k, v in tr.transform(fixture_rows[:8], 8).items()}
        images = np.random.default_rng(0).random((8, 32, 32, 3)).astype(
            np.float32)
        batch["image"] = jnp.asarray(images)
        model = WideDeep(
            plan=small_plan,
            deep_spec=DeepSpec(towers=(TowerSpec((16,), "simple"),)),
            model_type="wide_deep",
            cnn_spec=CnnSpec(model="resnet_cifar", resnet_size=20, height=32,
                             width=32))
        params, state = model.init(jax.random.PRNGKey(0), batch)
        assert "cnn" in params and "cnn_bn" in state
        logits, new_state = model.apply(params, state, batch, training=True,
                                        rng=jax.random.PRNGKey(1))
        assert logits.shape == (8, 1)
        loss, _ = model.loss_fn(params, state, batch, training=True,
                                rng=jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestCodecEdgeCases:
    """TFRecord proto codec edges found by review round 5."""

    def test_negative_int64_roundtrip(self):
        """-1 must encode as the 10-byte two's-complement varint and
        decode back SIGNED (the raw shift loop hung forever; the raw
        decode returned 2**64-1, overflowing np.int64)."""
        ser = tfrecord.serialize_example({"label": [-1, -7, 3]})
        ex = tfrecord.parse_example(ser)
        assert ex["label"] == [-1, -7, 3]
        import numpy as np
        assert np.array(ex["label"], np.int64).tolist() == [-1, -7, 3]

    def test_np_float32_values_stay_float(self):
        """np.float32 is not a Python float subclass — the old isinstance
        sniff silently truncated [0.7, 1.9] to ints [0, 1]."""
        import numpy as np
        vals = list(np.asarray([0.7, 1.9], np.float32))
        ex = tfrecord.parse_example(
            tfrecord.serialize_example({"x": vals}))
        np.testing.assert_allclose(ex["x"], [0.7, 1.9], rtol=1e-6)

    def test_truncated_record_raises(self, tmp_path):
        """A file cut mid-record must raise (reference DataLossError
        parity), not silently drop the dataset's tail."""
        path = str(tmp_path / "t.tfrecords")
        tfrecord.write_records(
            path, iter([b"payload-one", b"payload-two"]))
        whole = open(path, "rb").read()
        cut = str(tmp_path / "cut.tfrecords")
        with open(cut, "wb") as f:
            f.write(whole[:-7])  # cut inside record 2
        with pytest.raises(IOError, match="truncated"):
            list(tfrecord.read_records(cut))

    def test_record_offsets_random_access(self, tmp_path):
        payloads = [b"a" * 5, b"bb" * 9, b"c"]
        path = str(tmp_path / "r.tfrecords")
        tfrecord.write_records(path, iter(payloads))
        offs = tfrecord.record_offsets(path)
        assert len(offs) == 3
        with open(path, "rb") as f:
            # random access in arbitrary order matches the payloads
            for k in (2, 0, 1):
                assert tfrecord.read_record_at(f, *offs[k]) == payloads[k]
