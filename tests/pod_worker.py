"""Worker for the 4-process pod-recipe integration test.

Each of the 4 jax.distributed processes contributes 2 virtual CPU devices
to one global 8-device mesh and trains through TWO sharded input-service
loaders (tools/input_server.py subprocesses started by the test harness —
the exact production recipe of scripts/run_distributed.sh).  The worker
exercises the full pod lifecycle the reference's PS scripts could only
hand-wave (run_ps.sh:8-24): train -> checkpoint -> resume (fresh
deterministic stream keyed by the restored step) -> train -> eval, and
prints its losses for the harness's bit-consistency assertion.
"""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
coord_port = sys.argv[3]
conf_dir = sys.argv[4]
shared_dir = sys.argv[5]

# JAX_PLATFORMS/XLA_FLAGS/PALLAS_AXON_POOL_IPS set by the launcher
import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{coord_port}",
                           num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs
assert jax.device_count() == 2 * num_procs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wide_deep_tpu.config import Config  # noqa: E402
from wide_deep_tpu.features.input_service import (  # noqa: E402
    RemoteInputDataset)
from wide_deep_tpu.training.loop import Trainer  # noqa: E402

config = Config(conf_dir)
fixture = config.train["train_data"]
model_dir = os.path.join(shared_dir, "pod_model")

trainer = Trainer(config, model_type="wide_deep", model_dir=model_dir)
# the pod recipe must actually be in effect: two loaders, sharded plans,
# explicit exchange
assert "," in trainer.input_service, trainer.input_service
assert trainer.plan.scatter_shards == jax.device_count()
ds = trainer._dataset(fixture, "train")
assert isinstance(ds, RemoteInputDataset)
# proc routing: contiguous even groups over the 2 loaders
addrs = [a.strip() for a in trainer.input_service.split(",")]
assert ds.address[1] == int(addrs[proc_id * 2 // num_procs].split(":")[1])

trainer.ensure_initialized(restore=False)
loss1 = trainer.train_file(fixture)
trainer.save()
step_saved = trainer.global_step
eval1 = trainer.evaluate(fixture)

# resume: a NEW Trainer restores the checkpoint; its run_token (the
# restored global step, identical on every process) keys a fresh
# deterministic stream on the still-running loaders
trainer2 = Trainer(config, model_type="wide_deep", model_dir=model_dir)
trainer2.ensure_initialized(restore=True)
assert trainer2.global_step == step_saved, (trainer2.global_step,
                                            step_saved)
loss2 = trainer2.train_file(fixture)
eval2 = trainer2.evaluate(fixture)

print(f"PODRESULT p{proc_id} loss1={loss1:.6f} eval1={eval1['loss']:.6f} "
      f"resumed={trainer2.global_step} loss2={loss2:.6f} "
      f"eval2={eval2['loss']:.6f}", flush=True)
