"""Worker script for the 2-process jax.distributed test.

Each process contributes 4 virtual CPU devices to a global 8-device mesh,
trains two steps of the small wide_deep model on its row-shard of the
fixture data, and prints the final loss (must match across processes —
synchronous SPMD, unlike the reference's async parameter servers).
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]
conf_dir = sys.argv[4]

# NOTE: JAX_PLATFORMS/XLA_FLAGS/PALLAS_AXON_POOL_IPS must be set by the
# launcher (test_distributed.py) — a sitecustomize may initialize the
# platform before this script runs.
import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs
assert jax.device_count() == 4 * num_procs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wide_deep_tpu.config import Config  # noqa: E402
from wide_deep_tpu.training.loop import Trainer  # noqa: E402

from paths import UNIT_FIXTURE as FIXTURE

shared_dir = sys.argv[5] if len(sys.argv) > 5 else f"/tmp/wdt_dist_{proc_id}"

trainer = Trainer(
    Config(conf_dir), model_type="wide_deep",
    model_dir=shared_dir,
    overrides=dict(train_data=FIXTURE, eval_data=FIXTURE, test_data=FIXTURE,
                   keep_train=True, batch_size=16))
assert trainer.per_host_batch == 16 // num_procs
trainer.ensure_initialized(restore=False)
loss = trainer.train_file(FIXTURE)
res = trainer.evaluate(FIXTURE)

# multi-host checkpointing: all processes share one model_dir; orbax
# coordinates the write (primary host persists, others barrier-sync)
trainer.save()
step_saved = trainer.global_step

trainer2 = Trainer(
    Config(conf_dir), model_type="wide_deep", model_dir=shared_dir,
    overrides=dict(train_data=FIXTURE, eval_data=FIXTURE, test_data=FIXTURE,
                   keep_train=True, batch_size=16))
trainer2.ensure_initialized(restore=True)
assert trainer2.global_step == step_saved, (
    trainer2.global_step, step_saved)

print(f"RESULT p{proc_id} loss={loss:.6f} eval_loss={res['loss']:.6f} "
      f"count={res['global_step']} resumed={trainer2.global_step}",
      flush=True)

# ---- uneven-shard batch-count sync (round-2 fix) -------------------------
# 9 rows round-robin over 2 processes -> 5 vs 4 rows; per-host batch 4 ->
# p0 yields two batches, p1 one.  Without the padding protocol p1 would
# block forever inside make_array_from_process_local_data while p0 waits on
# its second batch.
from jax.experimental import multihost_utils  # noqa: E402

uneven = os.path.join(shared_dir, "uneven9")
if proc_id == 0:
    os.makedirs(shared_dir, exist_ok=True)
    with open(FIXTURE) as f:
        rows = f.readlines()[:9]
    with open(uneven + ".tmp", "w") as f:
        f.writelines(rows)
    os.replace(uneven + ".tmp", uneven)
multihost_utils.sync_global_devices("uneven_fixture_ready")

trainer3 = Trainer(
    Config(conf_dir), model_type="wide_deep", model_dir=shared_dir,
    overrides=dict(train_data=uneven, eval_data=uneven, test_data=uneven,
                   keep_train=True, batch_size=8))
assert trainer3.per_host_batch == 4
trainer3.ensure_initialized(restore=False)
loss9 = trainer3.train_file(uneven)
res9 = trainer3.evaluate(uneven)
print(f"RESULT2 p{proc_id} loss9={loss9:.6f} eval9={res9['loss']:.6f}",
      flush=True)

# ---- multi-host input service (round-3) -----------------------------------
# One loader (a thread on proc 0 here; tools/input_server.py in production)
# sees the GLOBAL batch and emits the per-shard kernel plans that per-host
# row sharding cannot — the sharded Pallas scatter path must survive a REAL
# multi-process mesh, bit-identically across processes.
svc_port = int(sys.argv[6]) if len(sys.argv) > 6 else 0
if svc_port:
    import shutil

    from wide_deep_tpu.features.plan import FeaturePlan

    # tiny batches never clear the volume gates; keep the structure
    FeaturePlan.scatter_group = (
        lambda self, g, b: bool(self.pallas_scatter
                                and g.rows % max(self.scatter_shards, 1)
                                == 0))

    conf_svc = os.path.join(shared_dir, "conf_svc")
    if proc_id == 0:
        shutil.copytree(conf_dir, conf_svc + ".tmp")
        with open(os.path.join(conf_svc + ".tmp", "train.yaml"), "a") as f:
            f.write("\ndistribution:\n  sharded_lookup: explicit\n"
                    f"  input_service: 127.0.0.1:{svc_port}\n")
        os.replace(conf_svc + ".tmp", conf_svc)
    multihost_utils.sync_global_devices("svc_conf_ready")

    overrides = dict(train_data=FIXTURE, eval_data=FIXTURE,
                     test_data=FIXTURE, keep_train=True, batch_size=16,
                     shard_threshold=64)
    server = None
    if proc_id == 0:
        from wide_deep_tpu.features.input_service import InputServer
        from wide_deep_tpu.features.pipeline import CsvDataset
        from wide_deep_tpu.training.loop import build_training_plan
        cfg = Config(conf_svc)
        train_conf = dict(cfg.train)
        train_conf.update(overrides)
        splan, _, _ = build_training_plan(
            cfg, train_conf, "wide_deep", n_dev=jax.device_count(),
            n_procs=num_procs, global_batch_input=True)
        assert splan.scatter_shards == jax.device_count()
        seed = int(cfg.runconfig.get("tf_random_seed") or 123)

        def factory(path, mode, epoch_seed, _p=splan, _s=seed):
            return CsvDataset(
                plan=_p, data_path=path, mode=mode, batch_size=16,
                shuffle_buffer=int(train_conf["num_examples"]),
                seed=_s + int(epoch_seed))

        server = InputServer(factory, n_procs=num_procs,
                             scatter_shards=splan.scatter_shards,
                             port=svc_port)
        server.start()
    multihost_utils.sync_global_devices("svc_server_up")

    trainer4 = Trainer(
        Config(conf_svc), model_type="wide_deep",
        model_dir=os.path.join(shared_dir, "svc_model"),
        overrides=overrides)
    assert trainer4.plan.scatter_shards == jax.device_count()
    assert trainer4.input_service
    spec = trainer4.plan.batch_spec(16)
    assert any(k.startswith("scat_ok_") for k in spec), "no sharded plans"
    from wide_deep_tpu.features.input_service import RemoteInputDataset
    assert isinstance(trainer4._dataset(FIXTURE, "train"),
                      RemoteInputDataset)
    trainer4.ensure_initialized(restore=False)
    loss_svc = trainer4.train_file(FIXTURE)
    res_svc = trainer4.evaluate(FIXTURE)
    print(f"RESULT3 p{proc_id} loss_svc={loss_svc:.6f} "
          f"eval_svc={res_svc['loss']:.6f}", flush=True)
    multihost_utils.sync_global_devices("svc_done")
    if server is not None:
        server.stop()
