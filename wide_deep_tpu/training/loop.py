"""Trainer: epoch-per-file train/eval/pred loops, checkpointing, logging.

Functional replacement for the reference entry-point loops
(/root/reference/python/train.py:65-170, eval.py:56-83, pred.py:52-74):

* ``train_and_eval`` — per epoch, per train file: train; evaluate eval data
  per file and test data every ``epochs_per_eval`` epochs (train.py:65-106).
* ``dynamic_train`` — rolling window: train on file[i], test on file[i+1],
  files sorted by name (train.py:109-148).
* ``train`` / ``evaluate`` / ``predict`` one-shots.

keep_train=0 wipes the model dir first (train.py:188-191); otherwise training
resumes from the latest checkpoint.  Step/sec logging follows
log_step_count_steps; checkpoint cadence follows runconfig (see
training/checkpoint.py).
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from wide_deep_tpu import metrics as metrics_lib
from wide_deep_tpu.config import Config
from wide_deep_tpu.features.pipeline import (CsvDataset,
                                             DevicePrefetchIterator,
                                             PrefetchIterator,
                                             default_transformer, list_files)
from wide_deep_tpu.features.plan import FeaturePlan
from wide_deep_tpu.models.joint import WideDeep, build_model
from wide_deep_tpu.optim import build_joint_optimizer
from wide_deep_tpu.parallel import mesh as mesh_lib
from wide_deep_tpu.training.checkpoint import CheckpointManager
from wide_deep_tpu.training.step import (make_eval_step, make_predict_step,
                                         make_train_step)

log = logging.getLogger("wide_deep_tpu")


def resolve_checkpoint(checkpoint_path: str):
    """Split an explicit checkpoint path into (manager_dir, step).

    The reference restored the *specific* checkpoint the path names
    (/root/reference/python/eval.py:74-78, pred.py:47-49).  Orbax lays
    checkpoints out as ``<model_dir>/<step>/``, so a path whose basename is an
    integer pins that step; a path to the model dir itself means "latest"
    (step None)."""
    p = os.path.abspath(checkpoint_path.rstrip("/"))
    base = os.path.basename(p)
    if base.isdigit():
        return os.path.dirname(p), int(base)
    return p, None


def build_training_plan(config: Config, train_conf: Dict[str, Any],
                        model_type: str, n_dev: int,
                        n_procs: int = 1,
                        global_batch_input: bool = False):
    """The training FeaturePlan for a (config, mesh topology) pair.

    Factored out of Trainer.__init__ so the multi-host input service
    (features/input_service.py, tools/input_server.py) can construct the
    BIT-IDENTICAL plan on the loader host: the per-batch kernel plans it
    emits must match the shapes the training processes compiled for.

    -> (plan, explicit_lookup, dedup_lookup).

    ``global_batch_input``: some host sees the whole global batch — true
    for single-process meshes and for multi-process meshes fed by the
    input service.  Kernel/dedup plans cover the global id stream, so
    they are only emitted when this holds; otherwise multi-device meshes
    keep GSPMD's collectives path.
    """
    from wide_deep_tpu.features.analyze import resolve_pack_budget
    from wide_deep_tpu.features.plan import fold_enabled
    budget = train_conf.get("pack_budget")
    if str(budget).lower() == "auto":
        # measured-occupancy pool sizing (features/analyze.py); pass the
        # raw override through so a CLI `--pack_budget auto` resolves
        # even when the conf pins an integer
        budget = resolve_pack_budget(config, train_conf.get("train_data"),
                                     raw=budget)
    # Pallas range-scatter backward for big tables (ops/scatter.py).
    # Single-device meshes: one plan per big group.  Multi-device meshes
    # with the explicit exchange: one plan PER TABLE SHARD
    # (parallel/exchange.planned_sharded_gather) — requires a host that
    # sees the global batch's id stream (single-process, or the input
    # service).  GSPMD-lookup multi-device meshes keep XLA's collectives
    # path (a pallas_call cannot be auto-partitioned by GSPMD).
    single_host_input = n_procs == 1 or global_batch_input
    # auto = explicit on multi-device meshes; on a single device there
    # is nothing to exchange — keep the plain gather (and its
    # fused_gather_split Pallas backward) instead.  'dedup' is the
    # host-assisted unique-row all-to-all variant for high-duplication
    # workloads (parallel/exchange.dedup_sharded_gather).
    lookup = config.distribution.get("sharded_lookup") or "auto"
    dedup_lookup = n_dev > 1 and lookup == "dedup" and single_host_input
    explicit_lookup = n_dev > 1 and (
        lookup in ("explicit", "auto") or dedup_lookup)
    want_pallas = (
        str(train_conf.get("scatter_mode") or "pallas") == "pallas")
    pallas_scatter = want_pallas and (
        n_dev == 1
        or (explicit_lookup and not dedup_lookup and single_host_input))
    scatter_shards = (n_dev if (n_dev > 1
                                and (pallas_scatter or dedup_lookup))
                      else 1)
    # The fused touched-rows optimizer (optim/sparse.apply_fused_update /
    # apply_fused_sharded_update) is valid only where its plans are:
    # single-device, or a multi-device mesh whose plans are PER TABLE
    # SHARD (scatter_shards == n_dev) built from the GLOBAL id stream.
    # Without this gate a multi-process mesh without the input service
    # would concatenate per-host compact plans (host-local perm/uids) into
    # garbage, and a GSPMD-lookup multi-device mesh would hand a
    # row-sharded table to an unpartitionable pallas_call.  It also uses
    # Pallas kernels (range_scatter_add + rowdma), so scatter_mode: xla
    # disables it alongside the scatter kernels.
    sparse_opt = (bool(train_conf.get("sparse_optimizer"))
                  and want_pallas
                  and (n_dev == 1
                       or (scatter_shards == n_dev and single_host_input)))
    plan = FeaturePlan(
        config, multivalue=train_conf["multivalue"],
        fold=fold_enabled(config, model_type),
        pack_budget=budget if budget not in (None, "") else None,
        pallas_scatter=pallas_scatter,
        scatter_shards=scatter_shards,
        shard_threshold=train_conf.get("shard_threshold"),
        shard_kind="dedup" if dedup_lookup else "scatter",
        # fused touched-rows optimizer for huge tables: batches carry
        # compact dedup plans (ops/scatter.make_compact_plan) consumed
        # by optim/sparse.apply_compact_update — topology-gated above
        sparse_opt=sparse_opt)
    return plan, explicit_lookup, dedup_lookup


class Trainer:
    def __init__(self, config: Optional[Config] = None,
                 model_type: Optional[str] = None,
                 model_dir: Optional[str] = None,
                 n_classes: int = 2,
                 mesh=None,
                 dtype=None,
                 overrides: Optional[Dict[str, Any]] = None):
        self.config = config or Config()
        self.train_conf = dict(self.config.train)
        if overrides:
            self.train_conf.update(
                {k: v for k, v in overrides.items() if v is not None})
        self.model_type = model_type or self.train_conf["model_type"]
        base_dir = model_dir or self.train_conf["model_dir"]
        self.model_dir = os.path.join(base_dir, self.model_type)
        self.runconfig = self.config.runconfig
        self.batch_size = int(self.train_conf["batch_size"])
        self.n_classes = n_classes
        self.seed = int(self.runconfig["tf_random_seed"])

        self.mesh = mesh if mesh is not None else mesh_lib.mesh_from_config(
            self.config)
        n_dev = self.mesh.devices.size
        # multi-host input service (features/input_service.py): a loader
        # process sees the GLOBAL batch and emits the per-shard kernel
        # plans multi-process meshes cannot build from per-host row shards
        self.input_service = (
            self.config.distribution.get("input_service") or None)
        self.plan, explicit_lookup, dedup_lookup = build_training_plan(
            self.config, self.train_conf, self.model_type, n_dev,
            n_procs=jax.process_count(),
            global_batch_input=bool(self.input_service))
        self.model: WideDeep = build_model(
            self.config, plan=self.plan, model_type=self.model_type,
            n_classes=n_classes, dtype=dtype)
        if explicit_lookup:
            # deliberate all-gather/psum_scatter exchange for row-sharded
            # tables instead of GSPMD's derived collectives; the threshold
            # is shared with the plan's sharded-scatter gating so a group
            # carries per-shard kernel plans iff its gathers go through the
            # exchange
            from wide_deep_tpu.parallel.exchange import enable_explicit_lookup
            enable_explicit_lookup(
                self.model, self.mesh,
                size_threshold=self.train_conf.get("shard_threshold"))
        decay_steps = max(
            float(self.train_conf["num_examples"]) / self.batch_size, 1.0)
        # touched-rows sparse updates for big tables (reference
        # SparseApplyAdagrad/Ftrl semantics; optim/sparse.py).  Opt-in:
        # measured slower than XLA's fused scatter+optimizer on v5e — see
        # the optim/sparse.py module docstring for the numbers.
        from wide_deep_tpu.optim.sparse import plan_sparse_tables
        # single-device: fused tables + apply_fused_update (one row-DMA
        # write-back); multi-device: per-table-shard compact plans +
        # apply_fused_sharded_update inside shard_map
        self.sparse_tables, sparse_paths = (
            plan_sparse_tables(
                self.plan, self.config.model, decay_steps, self.batch_size,
                enabled=bool(self.train_conf.get("sparse_optimizer")))
            if self.model.has_deep else ({}, frozenset()))
        self.tx = build_joint_optimizer(
            self.config.model, decay_steps,
            arms={"linear": self.model.has_wide, "dnn": self.model.has_deep,
                  "cnn": self.model.has_cnn},
            sparse_paths=sparse_paths)
        self.pos_weight = self.train_conf.get("pos_sample_loss_weight")
        self.neg_weight = self.train_conf.get("neg_sample_loss_weight")
        # step-cadenced eval (train.yaml[train] eval_every_n_steps): eval
        # interleaved by STEP cadence rather than by file boundary — the
        # capability the reference's train_and_eval_api mode reached for
        # (reference python/train.py:151-170, broken there: it rebuilt the
        # dataset per eval and silently disabled under distribution,
        # train.py:213-214).  Synchronous SPMD makes it exact instead:
        # every process runs the eval pass inline at the same step on the
        # live params, so it works unchanged under jax.distributed.
        self.eval_every_n_steps = int(
            self.train_conf.get("eval_every_n_steps") or 0)
        self.transformer = default_transformer(
            self.plan, n_classes, self.pos_weight, self.neg_weight,
            num_parallel_calls=self.train_conf.get("num_parallel_calls"))

        self._train_step = make_train_step(self.model, self.tx,
                                           with_summaries=True,
                                           sparse_tables=self.sparse_tables,
                                           mesh=self.mesh)
        self._eval_step = make_eval_step(self.model)
        self._predict_step = make_predict_step(self.model)
        self._ckpt: Optional[CheckpointManager] = None
        self._summary_writer = None
        self.params = None
        self.mstate = None
        self.opt_state = None
        self.global_step = 0
        self._prewarmed = False
        self._rng = jax.random.PRNGKey(self.seed)

    # ------------------------------------------------------------------ setup
    def _zero_batch(self) -> Dict[str, np.ndarray]:
        spec = self.plan.batch_spec(self.batch_size, self.n_classes,
                                    with_image=self.model.has_cnn)
        return {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}

    def ensure_initialized(self, restore: bool = True):
        if self.params is not None:
            return
        sample = self._zero_batch()
        sample["mask"] = np.ones_like(sample.get("mask", np.ones(self.batch_size, np.float32)))
        # single-row slice: init is batch-size independent, and a 1-row
        # sample keeps it off the hot-compile path
        sample1 = {k: v[:1] for k, v in sample.items()}
        # ONE jitted program for params + model state + optimizer state,
        # with the mesh shardings as out_shardings: eager init dispatched
        # each table initializer as its own tiny program (~45 s through a
        # remote-device tunnel for the production tables), and even two
        # jits (model, then opt) paid two remote compiles + dispatches —
        # merged, init measures ~6 s cold (tools/microbench_init.py)
        from wide_deep_tpu.training.step import init_opt_state

        def init_all(rng):
            params, mstate = self.model.init(rng, sample1)
            from wide_deep_tpu.optim.sparse import init_fused_params
            params = init_fused_params(params, self.sparse_tables)
            return params, mstate, init_opt_state(
                self.tx, params, self.sparse_tables)

        rng0 = jax.random.PRNGKey(self.seed)
        p_struct, _, opt_struct = jax.eval_shape(init_all, rng0)
        shardings = mesh_lib.param_shardings(self.mesh, p_struct)
        opt_shardings = mesh_lib.opt_state_shardings(
            self.mesh, p_struct, shardings, opt_struct)
        params, mstate, opt_state = jax.jit(
            init_all, out_shardings=(shardings,
                                     mesh_lib.replicated(self.mesh),
                                     opt_shardings))(rng0)
        self.params, self.mstate, self.opt_state = params, mstate, opt_state
        self._ckpt = CheckpointManager(self.model_dir, self.runconfig)
        if jax.process_index() == 0:
            # record resolved plan decisions (auto pack_budget, fold) so
            # export uses the training-time values (features/analyze.py).
            # WRITE-ONCE: eval/predict also pass through here, and their
            # plan (e.g. `auto` re-resolved against rotated data, or a CLI
            # override) may differ from the one the checkpointed params
            # were trained with — overwriting would hand export exactly
            # the train/serve skew this record exists to prevent.  A fresh
            # (keep_train=0, wiped dir) run writes a fresh record.
            from wide_deep_tpu.features.analyze import (load_plan_meta,
                                                        save_plan_meta)
            if load_plan_meta(self.model_dir) is None:
                save_plan_meta(self.model_dir, self.plan)
        if restore:
            restored = self._restore_tree(self._ckpt)
            if restored is not None:
                self.params = restored["params"]
                self.mstate = restored["mstate"]
                self.opt_state = restored["opt_state"]
                self.global_step = int(restored["step"])
                log.info("restored checkpoint at step %d", self.global_step)

    def _ckpt_tree(self):
        # fused sparse tables checkpoint as their live column block only —
        # the [rows, 128] row-DMA padding is provably zero and would double
        # the d32 table's checkpoint bytes (optim/sparse.compact_fused_ckpt)
        from wide_deep_tpu.optim.sparse import compact_fused_ckpt
        return {"params": compact_fused_ckpt(self.params, self.sparse_tables),
                "mstate": self.mstate,
                "opt_state": self.opt_state, "step": self.global_step}

    def _restore_tree(self, mgr: CheckpointManager,
                      step: Optional[int] = None):
        """Restore into the checkpoint layout, then re-expand fused tables
        to the live [rows, FUSED_WIDTH] layout.  Falls back to the legacy
        full-width layout for checkpoints written before the compact form
        existed."""
        from wide_deep_tpu.optim.sparse import expand_fused_ckpt
        try:
            restored = mgr.restore(self._ckpt_tree(), step=step)
        except Exception as compact_err:  # noqa: BLE001 — see below
            if not any(t.fused for t in self.sparse_tables.values()):
                raise
            # legacy fallback: checkpoints written before the compact
            # fused layout restore with full-width tables.  If THAT also
            # fails, the original (compact-layout) error is the one worth
            # debugging — a transient/corrupt-checkpoint failure must not
            # be masked by a confusing second tree-structure mismatch.
            log.warning("compact-layout restore failed (%s); retrying "
                        "with the legacy full-width layout", compact_err)
            try:
                restored = mgr.restore(
                    {"params": self.params, "mstate": self.mstate,
                     "opt_state": self.opt_state, "step": self.global_step},
                    step=step)
            except Exception as legacy_err:
                raise legacy_err from compact_err
        if restored is not None:
            restored["params"] = expand_fused_ckpt(
                restored["params"], self.sparse_tables, self.params)
        return restored

    def maybe_wipe_model_dir(self):
        if not self.train_conf["keep_train"] and os.path.isdir(self.model_dir):
            shutil.rmtree(self.model_dir)

    # ------------------------------------------------------------------ train
    def _image_path(self, mode: str, data_path: str) -> Optional[str]:
        if not self.model.has_cnn:
            return None
        if mode == "train":
            return self.train_conf.get("image_train_data")
        if data_path == self.train_conf.get("test_data") or mode == "pred":
            return self.train_conf.get("image_test_data")
        return self.train_conf.get("image_eval_data")

    def _verify_loader_streams(self, ds) -> None:
        """Sharded-loader cross-check: every loader GROUP must serve the
        identical deterministic stream.  The hello handshake already
        rejects a loader whose CONFIG fingerprint diverges; file lists,
        however, are resolved on the loader hosts only — so each process
        probes its loader's full stream id (config digest + resolved
        file-list digest from the ack) and all processes compare via a
        host allgather.  A loader group pointed at different data files
        fails here, before a single batch is consumed."""
        sid = ds.probe_stream_id() or ""
        import numpy as np
        from jax.experimental import multihost_utils
        buf = np.zeros(64, np.uint8)
        raw = sid.encode("utf-8")[:64]
        buf[:len(raw)] = np.frombuffer(raw, np.uint8)
        gathered = np.asarray(
            multihost_utils.process_allgather(buf)).reshape(-1, 64)
        ids = {bytes(row.tobytes()).rstrip(b"\0").decode("utf-8", "replace")
               for row in gathered}
        if len(ids) > 1:
            raise ValueError(
                f"input-service loader groups serve DIVERGENT streams "
                f"(stream ids {sorted(ids)}) — all loaders must run the "
                f"same conf, seed, and data file list; check each "
                f"loader's --train_data and conf directory")

    def _dataset(self, path: str, mode: str, epoch_seed: int = 0):
        if self.input_service and mode == "train":
            # multi-host input service: the loader host sees the GLOBAL
            # batch and emits the per-shard kernel plans per-host row
            # sharding cannot (features/input_service.py); also gives a
            # deterministic global data order across epochs
            from wide_deep_tpu.features.input_service import (
                RemoteInputDataset)
            # joint CNN: the loader composes the image TFRecord stream
            # with the CSV stream (tools/input_server.py --image_train_data
            # builds ImageCsvDataset) and the [B, H, W, C] image entry
            # slices per process like any batch-axis feature
            image_shape = (224, 224, 3)
            if self.model.has_cnn:
                cs = self.model.cnn_spec
                image_shape = (cs.height, cs.width, cs.channels)
            # pod-scale sharded loaders: "addrA,addrB" splits the procs
            # into len(addrs) contiguous even groups, group g served by
            # addrs[g] (loaders started with the matching --proc_start/
            # --proc_count and the same conf + seed, so every loader
            # materializes the identical global stream).  The hello
            # carries the expected group range so a misranged loader
            # rejects instead of deadlocking at its prefetch limit.
            from wide_deep_tpu.features.input_service import (
                group_range_for_proc, loader_for_proc, stream_fingerprint)
            addrs = [a.strip() for a in self.input_service.split(",")
                     if a.strip()]
            n_procs = jax.process_count()
            address = loader_for_proc(addrs, jax.process_index(), n_procs)
            grange = group_range_for_proc(len(addrs), jax.process_index(),
                                          n_procs)
            # stream-identity handshake: this digest must match the
            # loader's (same formula over ITS config) or the hello is
            # rejected — catching a loader started with a different
            # seed/conf/batch before it can serve divergent slices
            fingerprint = stream_fingerprint(
                self.seed, self.batch_size, self.n_classes,
                self.plan.scatter_shards, n_procs,
                pos_weight=self.pos_weight, neg_weight=self.neg_weight,
                model_type=self.model_type,
                shuffle_buffer=int(self.train_conf["num_examples"]))
            ds = RemoteInputDataset(
                self.plan, address, path, mode,
                global_batch=self.batch_size, group_range=grange,
                proc=jax.process_index(), n_procs=jax.process_count(),
                epoch_seed=epoch_seed, n_classes=self.n_classes,
                with_image=self.model.has_cnn, image_shape=image_shape,
                fingerprint=fingerprint,
                # resumed runs replay (path, epoch_seed) — the step count
                # (identical on every process after restore) keys a fresh
                # deterministic stream on the loader
                run_token=self.global_step)
            if len(addrs) > 1 and n_procs > 1:
                self._verify_loader_streams(ds)
            return ds
        # per-worker row sharding (reference dataset.shard semantics,
        # dataset.py:173-174), driven by the live process topology
        num_shards = jax.process_count()
        shard_index = jax.process_index()
        kwargs = dict(
            n_classes=self.n_classes, pos_weight=self.pos_weight,
            neg_weight=self.neg_weight,
            shuffle_buffer=int(self.train_conf["num_examples"]),
            seed=self.seed + epoch_seed,
            num_shards=num_shards, shard_index=shard_index,
            transformer=self.transformer)
        img = self._image_path(mode, path)
        if img:
            from wide_deep_tpu.features.image import ImageCsvDataset
            cnn = self.model.cnn_spec
            return ImageCsvDataset(
                self.plan, path, img, mode, self.per_host_batch,
                height=cnn.height, width=cnn.width, channels=cnn.channels,
                **kwargs)
        return CsvDataset(self.plan, path, mode, self.per_host_batch,
                          **kwargs)

    def _to_device(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Host batch -> device arrays on the mesh.

        Single-process: plain device_put with the batch sharding.
        Multi-process: each host holds its shard of the global batch
        (CsvDataset already row-shards by process); assemble the global
        array from per-process local data."""
        if jax.process_count() > 1:
            # per-key shardings: plan arrays (leading n_shards axis, served
            # as each process's device block by the input service) assemble
            # over the whole mesh; everything else over 'data'
            plan_sharded = self.plan.scatter_shards > 1
            return {k: jax.make_array_from_process_local_data(
                        mesh_lib.batch_key_sharding(
                            self.mesh, k, v, plan_sharded=plan_sharded), v)
                    for k, v in batch.items()}
        # ONE device_put over the whole pytree, not one per key: each
        # dispatch pays a fixed per-transfer latency that dominates for
        # ~90-key batches (measured on the remote-device tunnel: 86 keys
        # per-key 143 ms vs one pytree call 43 ms for the same bytes)
        shardings = {k: mesh_lib.batch_key_sharding(self.mesh, k, v)
                     for k, v in batch.items()}
        return jax.device_put(batch, shardings)

    @property
    def per_host_batch(self) -> int:
        return max(self.batch_size // jax.process_count(), 1)

    def _synced_batches(self, dataset):
        """Prefetched batches with process-synchronized batch counts.

        Rows are round-robin sharded per process (pipeline.CsvDataset), so
        shard sizes straddling a batch boundary can leave one process with
        one more batch than another — and make_array_from_process_local_data
        requires every process to participate in every global array, which
        would deadlock.  Before each batch, processes agree on whether anyone
        still has data; exhausted processes feed zero-mask padding batches
        (weight 0, so metrics/loss are unaffected) until all are done."""
        it = iter(PrefetchIterator(dataset))
        if jax.process_count() == 1:
            yield from it
            return
        from jax.experimental import multihost_utils
        pad = None
        mode = getattr(dataset, "mode", "train")
        exhausted = False
        while True:
            batch = None if exhausted else next(it, None)
            exhausted = batch is None
            have = multihost_utils.process_allgather(
                np.asarray(batch is not None))
            if not np.any(have):
                return
            if batch is None:
                if pad is None:
                    # remote datasets carry their own per-host contract
                    # (plan arrays slice on the shard axis, not batch)
                    spec = getattr(dataset, "local_spec",
                                   None) or self.plan.batch_spec(
                        self.per_host_batch, self.n_classes,
                        with_image=self.model.has_cnn, mode=mode)
                    pad = {k: np.zeros(shape, dt)
                           for k, (shape, dt) in spec.items()}
                batch = pad
            yield batch

    def _prewarm(self, batch) -> None:
        """Compile the train step via the explicit trace/lower/compile
        chain before its first call — ONLY when the persistent compile
        cache is active: the call path does not reuse the AOT executable
        in-process (round-5 instrumented bench: AOT compile 54.2 s, then
        the first jit call paid its own 218.9 s compile), so the chain
        pays off exactly when its result lands in the on-disk cache for
        the call path (and every later process) to hit.  Best-effort: on
        any failure the first call compiles as usual."""
        if self._prewarmed:
            return
        self._prewarmed = True
        from wide_deep_tpu.cache import persistent_cache_active
        if not persistent_cache_active():
            return
        try:
            t0 = time.time()
            self._train_step.trace(
                self.params, self.mstate, self.opt_state, batch,
                self._rng, self.global_step).lower().compile()
            log.info("train step compiled in %.1fs", time.time() - t0)
        except Exception:  # noqa: BLE001 — the jit call will compile
            log.debug("train-step prewarm failed; jit compiles on call",
                      exc_info=True)

    def train_file(self, path: str, epoch_seed: int = 0) -> float:
        """Train over one file; returns the last batch loss."""
        self.ensure_initialized()
        log_every = int(self.runconfig.get("log_step_count_steps") or 100)
        t0 = time.time()
        last_log_step, last_log_time = self.global_step, t0
        loss = float("nan")
        summary_every = int(self.runconfig.get("save_summary_steps") or 0)
        source = self._synced_batches(self._dataset(path, "train",
                                                    epoch_seed))
        on_device = jax.process_count() == 1
        if on_device:
            # single-process: run the host->device copy in a background
            # thread too (parse | transfer | step all overlap; the copy
            # was the largest serialized stage on remote-device rigs —
            # pipeline.DevicePrefetchIterator).  Multi-process keeps the
            # inline path: _to_device there assembles global arrays with
            # collective participation that must stay in lockstep.
            source = DevicePrefetchIterator(source, self._to_device)
        for batch in source:
            if not on_device:
                batch = self._to_device(batch)
            self._prewarm(batch)
            (self.params, self.mstate, self.opt_state, loss,
             stats) = self._train_step(
                self.params, self.mstate, self.opt_state, batch, self._rng,
                self.global_step)
            self.global_step += 1
            if summary_every and self.global_step % summary_every == 0:
                self._write_summaries(float(loss), stats)
            if self.global_step % log_every == 0:
                now = time.time()
                sps = (self.global_step - last_log_step) / max(
                    now - last_log_time, 1e-9)
                log.info("step %d  loss %.5f  %.1f steps/s  %.0f ex/s",
                         self.global_step, float(loss), sps,
                         sps * self.batch_size)
                last_log_step, last_log_time = self.global_step, now
            if self._ckpt.should_save(self.global_step):
                self._ckpt.save(self.global_step, self._ckpt_tree())
            if (self.eval_every_n_steps
                    and self.global_step % self.eval_every_n_steps == 0):
                res = self.evaluate(self.train_conf["eval_data"])
                log.info("step %d cadenced eval: %s", self.global_step,
                         _fmt(res))
                self._write_eval_summaries(res)
        log.info("finished %s in %.1f s (step %d)", os.path.basename(path),
                 time.time() - t0, self.global_step)
        return float(loss)

    def train_stream(self, host: str, port: int,
                     max_batches: Optional[int] = None,
                     flush_timeout_s: float = 1.0,
                     reconnect: bool = False,
                     max_retries: int = 30) -> float:
        """Train continuously on a live TSV stream (features/stream.py):
        arrival-ordered batches, idle-flush for partial batches, checkpoint
        cadence as configured.  Returns the last batch loss; the stream
        ending (producer closed, or with ``reconnect`` every retry
        exhausted) returns normally — combined with the checkpoint cadence
        this makes producer restarts and training restarts both safe."""
        from wide_deep_tpu.features.stream import StreamDataset
        self.ensure_initialized()
        ds = StreamDataset(
            self.plan, host, port, mode="train",
            batch_size=self.per_host_batch, n_classes=self.n_classes,
            pos_weight=self.pos_weight, neg_weight=self.neg_weight,
            flush_timeout_s=flush_timeout_s, max_batches=max_batches,
            transformer=self.transformer,
            reconnect=reconnect, max_retries=max_retries)
        loss = float("nan")
        for batch in ds:
            batch = self._to_device(batch)
            self._prewarm(batch)
            (self.params, self.mstate, self.opt_state, loss,
             _) = self._train_step(
                self.params, self.mstate, self.opt_state, batch, self._rng,
                self.global_step)
            self.global_step += 1
            if self._ckpt.should_save(self.global_step):
                self._ckpt.save(self.global_step, self._ckpt_tree())
        log.info("stream ended after %d rows (step %d)", ds.rows_seen,
                 self.global_step)
        return float(loss)

    def save(self, force: bool = True):
        self.ensure_initialized()
        self._ckpt.save(self.global_step, self._ckpt_tree(), force=force)
        # explicit saves (end of training, SIGINT handler) must be durable
        # on return — only the cadenced in-loop saves overlap training
        self._ckpt.wait()

    def _write_summaries(self, loss: float, stats: Dict[str, Any]):
        """Scalar + histogram summaries at save_summary_steps cadence
        (train.yaml:93, model_util.py:15-17 parity)."""
        if self._summary_writer is None:
            from wide_deep_tpu.training.summary import SummaryWriter
            self._summary_writer = SummaryWriter(
                os.path.join(self.model_dir, "summaries"))
        w = self._summary_writer
        scalars = {"loss": loss}
        scalars.update({k: float(v) for k, v in stats.items()})
        w.scalars(scalars, self.global_step)
        # parameter histograms, host-side (weights, not activations)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                self.params)[0]:
            keys = [str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path]
            if keys[-1] in ("kernel", "b", "bias") and "towers" in keys:
                w.histogram("/".join(keys), np.asarray(leaf),
                            self.global_step)
        w.flush()

    def _write_eval_summaries(self, results: Dict[str, float]):
        """Eval metrics under an eval/ tag prefix (the estimator's eval
        summary dir analog) at the step-cadenced eval points."""
        if self._summary_writer is None:
            from wide_deep_tpu.training.summary import SummaryWriter
            self._summary_writer = SummaryWriter(
                os.path.join(self.model_dir, "summaries"))
        scalars = {f"eval/{k}": float(v) for k, v in results.items()
                   if k != "global_step"}
        self._summary_writer.scalars(scalars, self.global_step)
        self._summary_writer.flush()

    def _restore_pinned(self, checkpoint_path: str):
        """Restore the exact checkpoint an explicit path names (eval.py:74-78,
        pred.py:47-49 parity); raises if it does not exist."""
        mgr_dir, step = resolve_checkpoint(checkpoint_path)
        mgr = CheckpointManager(mgr_dir, self.runconfig)
        steps = mgr.all_steps()
        if step is None:
            step = mgr.latest_step()
        if step is None or step not in steps:
            raise FileNotFoundError(
                f"no checkpoint at {checkpoint_path!r} "
                f"(available steps under {mgr_dir}: {steps})")
        restored = self._restore_tree(mgr, step=step)
        self.params, self.mstate = restored["params"], restored["mstate"]
        self.global_step = int(restored["step"])

    # ------------------------------------------------------------------- eval
    def evaluate(self, data_path: Optional[str] = None,
                 checkpoint_path: Optional[str] = None) -> Dict[str, float]:
        self.ensure_initialized()
        data_path = data_path or self.train_conf["test_data"]
        if checkpoint_path:
            self._restore_pinned(checkpoint_path)
        acc = metrics_lib.init_metrics()
        for batch in self._synced_batches(self._dataset(data_path, "eval")):
            batch = self._to_device(batch)
            acc = self._eval_step(self.params, self.mstate, batch, acc)
        results = metrics_lib.finalize_metrics(acc, binary=self.n_classes == 2)
        results["global_step"] = self.global_step
        return results

    def predict(self, data_path: Optional[str] = None,
                checkpoint_path: Optional[str] = None
                ) -> Iterator[Dict[str, Any]]:
        """Streaming per-example predictions (pred.py:65-74 parity).

        Single-process only, like the reference's pred.py: the streaming
        per-example yield cannot participate in a multi-host SPMD program
        (process-local batches against globally-sharded params, and no
        batch-count sync).  Distributed metrics go through ``evaluate``;
        bulk scoring goes through serving."""
        if jax.process_count() > 1:
            raise ValueError(
                "predict() runs single-process (the reference's pred.py "
                "likewise); run tools/pred.py on one host against the "
                "checkpoint, use evaluate() for distributed metrics, or "
                "serve the exported bundle for bulk scoring")
        self.ensure_initialized()
        if checkpoint_path:
            self._restore_pinned(checkpoint_path)
        data_path = data_path or self.train_conf["test_data"]
        for batch in PrefetchIterator(self._dataset(data_path, "pred")):
            preds = self._predict_step(self.params, self.mstate, batch)
            preds = {k: np.asarray(v) for k, v in preds.items()}
            n = int(batch["mask"].sum())
            for i in range(n):
                yield {k: v[i] for k, v in preds.items()}

    # ------------------------------------------------------------- loop modes
    def train_and_eval(self):
        """train.py:65-106 semantics."""
        conf = self.train_conf
        for epoch in range(int(conf["train_epochs"])):
            files = list_files(conf["train_data"])
            for path in files:
                self.train_file(path, epoch_seed=epoch)
                res = self.evaluate(conf["eval_data"])
                log.info("epoch %d eval %s: %s", epoch,
                         os.path.basename(path), _fmt(res))
            if (epoch + 1) % int(conf["epochs_per_eval"]) == 0:
                res = self.evaluate(conf["test_data"])
                log.info("epoch %d test: %s", epoch, _fmt(res))
            self.save()

    def dynamic_train(self):
        """Rolling-window mode (train.py:109-148): train file[i], test
        file[i+1]."""
        conf = self.train_conf
        files = sorted(list_files(conf["train_data"]))
        for epoch in range(int(conf["train_epochs"])):
            for i, path in enumerate(files):
                self.train_file(path, epoch_seed=epoch)
                if i + 1 < len(files):
                    res = self.evaluate(files[i + 1])
                    log.info("dynamic eval on %s: %s",
                             os.path.basename(files[i + 1]), _fmt(res))
            self.save()

    def train_and_evaluate(self):
        """Name-parity alias for the reference's train_and_eval_api mode
        (train.py:151-170, which wrapped tf.estimator.train_and_evaluate);
        semantics are the same interleaved loop as train_and_eval."""
        return self.train_and_eval()

    def train(self):
        """Plain training, no interleaved eval (distributed mode default,
        train.py:213-214)."""
        conf = self.train_conf
        for epoch in range(int(conf["train_epochs"])):
            for path in list_files(conf["train_data"]):
                self.train_file(path, epoch_seed=epoch)
            self.save()


def _fmt(res: Dict[str, float]) -> str:
    return "  ".join(f"{k}={v:.6g}" for k, v in sorted(res.items()))
