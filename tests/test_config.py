"""Config-stack tests (reference surface: read_conf.py:41-279)."""

import pytest

from wide_deep_tpu.config import Config, ConfigError, parse_optimizer_spec


def test_schema(config):
    schema = config.read_schema()
    assert len(schema) == 61
    assert schema[1] == "clk"
    assert schema[61] == "rk_hour"
    assert config.label_column == "clk"


def test_feature_conf(config):
    fc = config.read_feature_conf()
    # 16 hash + 17 vocab + 3 identity + 3 continuous = 39 active features
    kinds = {}
    for name, conf in fc.items():
        key = conf["transform"] or "raw"
        kinds[key] = kinds.get(key, 0) + 1
    assert kinds["hash_bucket"] == 16
    assert kinds["identity"] == 3
    assert kinds["min_max"] == 3
    assert fc["u"]["parameter"] == 10000000
    assert fc["age"]["parameter"]["normalization"] == [10, 90]
    assert fc["ucomp"]["max_len"] == 8


def test_cross_conf(config):
    crosses = config.read_cross_feature_conf()
    assert len(crosses) == 31
    by_name = {"&".join(m): (size, deep) for m, size, deep in crosses}
    # hash_bucket_size unit is thousands (read_conf.py:111-154)
    assert by_name["age&ugender"] == (100, True)
    assert by_name["adplan_id&category&ucomp"] == (1000000, True)


def test_get_feature_name(config):
    assert len(config.get_feature_name("all")) == 60
    used = config.get_feature_name("used")
    assert len(used) == 39
    assert len(config.get_feature_name("unused")) == 21
    assert set(config.get_feature_name("continuous")) == {
        "longitude", "latitude", "age"}
    assert len(config.get_feature_name("category")) == 36


def test_train_conf(config):
    t = config.train
    assert t["model_type"] == "wide_deep"
    assert t["batch_size"] == 64
    assert t["multivalue"] is True
    assert t["num_examples"] == 10000
    r = config.runconfig
    assert r["tf_random_seed"] == 123
    assert r["save_checkpoints_secs"] == 1800


def test_model_conf(config):
    m = config.model
    assert m["linear_optimizer"]["name"] == "Ftrl"
    assert m["linear_optimizer"]["l1_regularization_strength"] == 0.5
    assert m["dnn_hidden_units"] == [1024, 512, 256]
    assert m["dnn_batch_normalization"] is True
    assert m["dnn_dropout"] == 0.0


def test_optimizer_spec_parsing():
    spec = parse_optimizer_spec(
        "tf.train.FtrlOptimizer(learning_rate=0.1,"
        "l1_regularization_strength=0.5,l2_regularization_strength=1)", 0.05)
    assert spec == {"name": "Ftrl", "learning_rate": 0.1,
                    "l1_regularization_strength": 0.5,
                    "l2_regularization_strength": 1}
    assert parse_optimizer_spec("adagrad", 0.03) == {
        "name": "Adagrad", "learning_rate": 0.03}
    with pytest.raises(ConfigError):
        parse_optimizer_spec("__import__('os')", 0.05)
    with pytest.raises(ConfigError):
        parse_optimizer_spec("tf.train.FtrlOptimizer(learning_rate=os.path)", 0.05)


def test_vocab_file_support(tmp_path, config):
    """vocab parameter may be a file path (one value per line) — the
    categorical_column_with_vocabulary_file analog."""
    import shutil
    conf2 = tmp_path / "conf"
    shutil.copytree(config.conf_dir, conf2)
    (conf2 / "os_vocab.txt").write_text("0\n1\n2\n3\n4\n5\n")
    feat = (conf2 / "feature.yaml").read_text()
    feat = feat.replace(
        "os:                 {type: category, transform: vocab, "
        "parameter: [0, 1, 2, 3, 4, 5]}",
        "os:                 {type: category, transform: vocab, "
        "parameter: os_vocab.txt}")
    (conf2 / "feature.yaml").write_text(feat)
    fc = Config(str(conf2)).read_feature_conf()
    assert fc["os"]["parameter"] == ["0", "1", "2", "3", "4", "5"]
    # missing file errors clearly
    feat2 = feat.replace("os_vocab.txt", "missing_vocab.txt")
    (conf2 / "feature.yaml").write_text(feat2)
    with pytest.raises(ConfigError, match="vocab file not found"):
        Config(str(conf2)).read_feature_conf()


def test_validation_errors(tmp_path, config):
    import shutil, os
    conf2 = tmp_path / "conf"
    shutil.copytree(config.conf_dir, conf2)
    (conf2 / "feature.yaml").write_text(
        "bogus_feature: {type: category, transform: hash_bucket, parameter: 10}\n")
    with pytest.raises(ConfigError, match="not present in schema"):
        Config(str(conf2)).read_feature_conf()
    (conf2 / "feature.yaml").write_text(
        "age: {type: continuous, transform: bad_scale, parameter: {normalization: [0, 1]}}\n")
    with pytest.raises(ConfigError, match="continuous transform"):
        Config(str(conf2)).read_feature_conf()
    (conf2 / "feature.yaml").write_text(
        "adplan_id: {type: category, transform: hash_bucket, parameter: -5}\n")
    with pytest.raises(ConfigError, match="positive int"):
        Config(str(conf2)).read_feature_conf()


def test_input_service_port_validated(tmp_path, config):
    """input_service entries fail at config-parse time for BOTH malformed
    and out-of-range ports — not as a socket error at pod startup."""
    import shutil
    conf2 = tmp_path / "conf"
    shutil.copytree(config.conf_dir, conf2)
    train = (conf2 / "train.yaml")
    base = train.read_text()

    def with_service(value):
        # replace the shipped empty entry (YAML duplicate keys take the
        # LAST value, so inserting a second key would be masked by it)
        assert '\n  input_service: ""\n' in base
        return base.replace('\n  input_service: ""\n',
                            f'\n  input_service: "{value}"\n', 1)

    train.write_text(with_service("loader:8600"))
    assert Config(str(conf2)).distribution["input_service"] == "loader:8600"
    train.write_text(with_service("loader:notaport"))
    with pytest.raises(ConfigError, match="host:port"):
        Config(str(conf2)).distribution
    train.write_text(with_service("loader:99999"))
    with pytest.raises(ConfigError, match="1-65535"):
        Config(str(conf2)).distribution
    train.write_text(with_service("loader:0"))
    with pytest.raises(ConfigError, match="1-65535"):
        Config(str(conf2)).distribution


def test_explicit_zero_lr_fails_loudly(tmp_path, config):
    """An explicit 0 learning rate must raise, not silently become 0.05
    (regression: `or 0.05` swallowed explicit zeros)."""
    import shutil
    from wide_deep_tpu.config import Config, ConfigError
    conf2 = tmp_path / "conf"
    shutil.copytree(config.conf_dir, conf2)
    model = (conf2 / "model.yaml").read_text()
    assert "linear_initial_learning_rate" in model
    import re
    patched = re.sub(r"linear_initial_learning_rate:.*",
                     "linear_initial_learning_rate: 0", model)
    (conf2 / "model.yaml").write_text(patched)
    with pytest.raises(ConfigError, match="must be > 0"):
        Config(str(conf2)).model


def test_explicit_zero_fold_max_rows_honored(tmp_path, config):
    """wide_fold_max_rows: 0 means 'fold no tables', not the default cap."""
    import shutil
    from wide_deep_tpu.config import Config
    from wide_deep_tpu.features.plan import FeaturePlan
    conf2 = tmp_path / "conf"
    shutil.copytree(config.conf_dir, conf2)
    with open(conf2 / "model.yaml", "a") as f:
        f.write("\nwide_fold_max_rows: 0\n")
    c = Config(str(conf2))
    assert c.model["wide_fold_max_rows"] == 0
    plan = FeaturePlan(c)
    assert plan.fold_max_rows == 0
    # unset still falls back to the default cap
    assert Config(str(config.conf_dir)).model["wide_fold_max_rows"] is None
