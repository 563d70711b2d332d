"""Export bundles: the SavedModel analog.

The reference exported a TF SavedModel by rebuilding feature columns and
calling ``export_savedmodel``
(/root/reference/python/tensorflow_serving/export_savedmodel.py:42-80).  Our
bundle is a versioned directory

  <export_dir>/<model_name>/<version>/
      params/          orbax checkpoint of {params, mstate}
      bundle.json      feature-plan dict + model config + conf-file copies
      params.txt       (optional, as_text=1) human-readable tensor dump

holding everything serving needs: the compiled feature plan (so the server
hashes/crosses identically without the original conf dir), the model
definition, and the trained parameters.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from wide_deep_tpu.config import Config
from wide_deep_tpu.features.plan import FeaturePlan
from wide_deep_tpu.models.joint import WideDeep, build_model

BUNDLE_FILE = "bundle.json"


def export_savedmodel(config: Config, export_dir: str,
                      model_type: Optional[str] = None,
                      checkpoint_path: Optional[str] = None,
                      model_version: int = 1,
                      as_text: bool = False,
                      model_dir: Optional[str] = None,
                      n_classes: int = 2) -> str:
    """Train-side export: restore latest/explicit checkpoint, write bundle.

    Returns the versioned bundle path."""
    serving = config.serving
    model_type = model_type or serving["model_type"]
    from wide_deep_tpu.features.analyze import (load_plan_meta,
                                                resolve_pack_budget)
    from wide_deep_tpu.features.plan import fold_enabled
    # prefer the plan decisions recorded at training time (plan_meta.json in
    # the checkpoint dir) over re-deriving them — `pack_budget: auto` could
    # otherwise resolve differently against rotated data (train/serve skew).
    # An EXPLICIT checkpoint_path may point at a different run than
    # config.train['model_dir']: its OWN plan meta (next to the checkpoint
    # steps) is authoritative — the configured dir's meta could describe a
    # different fold/pack decision than the restored params were trained
    # with.
    meta = None
    if checkpoint_path:
        from wide_deep_tpu.training.loop import resolve_checkpoint
        ckpt_meta_dir, _ = resolve_checkpoint(checkpoint_path)
        meta = load_plan_meta(ckpt_meta_dir)
    if meta is None:
        meta = load_plan_meta(os.path.join(
            model_dir or config.train["model_dir"], model_type))
    plan = FeaturePlan(
        config,
        fold=(meta["fold"] if meta else fold_enabled(config, model_type)),
        pack_budget=(meta["pack_budget"] if meta
                     else resolve_pack_budget(config)))
    model = build_model(config, plan=plan, model_type=model_type,
                        n_classes=n_classes)

    # abstract param tree only (shapes/dtypes for the fused-table slimming
    # below): eval_shape instead of a real init — materializing the ~8 GB
    # production param set on device just to read its shapes risks a
    # deferred OOM on a busy chip
    spec = plan.batch_spec(1, n_classes, with_image=model.has_cnn)
    sample = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    params, mstate = jax.eval_shape(
        lambda r: model.init(r, sample), jax.random.PRNGKey(0))

    # Resolve the checkpoint: an explicit checkpoint_path pins the exact step
    # it names (orbax layout <model_dir>/<step>/); otherwise latest under the
    # model dir.  A missing checkpoint is an error — silently exporting the
    # freshly-initialized params would produce a valid-looking but untrained
    # bundle (the reference likewise failed on a missing checkpoint,
    # export_savedmodel.py:34-35,74-80).
    from wide_deep_tpu.training.loop import resolve_checkpoint
    if checkpoint_path:
        ckpt_dir, step = resolve_checkpoint(checkpoint_path)
    else:
        ckpt_dir = os.path.join(
            model_dir or config.train["model_dir"], model_type)
        step = None
    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    steps = list(mgr.all_steps() or [])
    if step is None:
        step = mgr.latest_step()
    if step is None or step not in steps:
        mgr.close()
        raise FileNotFoundError(
            f"no checkpoint to export at {checkpoint_path or ckpt_dir!r} "
            f"(available steps: {steps})")
    restored = mgr.restore(step)
    abstract_params = params
    params = restored["params"]
    mstate = restored["mstate"]
    mgr.close()

    # Fused sparse tables (optim/sparse.py) store optimizer slots in extra
    # f32 columns ([rows, 128] instead of [rows, dim]); bundles carry only
    # the embedding block in the serving dtype — load_bundle builds an
    # unfused model and a fat table would also quadruple the bundle.
    def _slim(init_leaf, leaf):
        # >=, not >: a checkpoint-compacted fused table with zero optimizer
        # slots (SGD) is already at the serving width but still f32
        # (optim/sparse.compact_fused_ckpt) — the cast must still happen
        if (getattr(init_leaf, "ndim", 0) == 2 and getattr(leaf, "ndim", 0) == 2
                and leaf.shape[0] == init_leaf.shape[0]
                and leaf.shape[1] >= init_leaf.shape[1]):
            return leaf[:, :init_leaf.shape[1]].astype(init_leaf.dtype)
        return leaf

    params = jax.tree.map(_slim, abstract_params, params)

    version_dir = os.path.join(os.path.abspath(export_dir), str(model_version))
    os.makedirs(version_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(version_dir, "params"),
               {"params": params, "mstate": mstate}, force=True)
    ckptr.wait_until_finished()

    bundle = {
        "format_version": 1,
        "model_type": model_type,
        "n_classes": n_classes,
        "global_step": int(step) if step is not None else 0,
        "plan": plan.to_dict(),
        "model_conf": _jsonable(config.model),
        "train_conf": {"multivalue": config.train["multivalue"]},
        "conf_files": _conf_files(config),
    }
    with open(os.path.join(version_dir, BUNDLE_FILE), "w") as f:
        json.dump(bundle, f)
    if as_text:
        with open(os.path.join(version_dir, "params.txt"), "w") as f:
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
                name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                for p in path)
                arr = np.asarray(leaf)
                f.write(f"{name} {arr.shape} {arr.dtype}\n")
                np.savetxt(f, arr.reshape(-1)[:64][None], fmt="%.6g")
    return version_dir


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


def _conf_files(config: Config) -> Dict[str, str]:
    out = {}
    for name in ("schema", "feature", "cross_feature", "model"):
        path = os.path.join(config.conf_dir, name + ".yaml")
        if os.path.exists(path):
            with open(path) as f:
                out[name + ".yaml"] = f.read()
    return out


def load_bundle(version_dir: str, config: Optional[Config] = None
                ) -> Tuple[WideDeep, Dict, Dict, Dict]:
    """Serving-side load: -> (model, params, mstate, bundle_meta).

    Reconstructs the plan from the embedded conf files so the serving host
    needs no external configuration.
    """
    import tempfile

    with open(os.path.join(version_dir, BUNDLE_FILE)) as f:
        bundle = json.load(f)
    if config is None:
        conf_dir = tempfile.mkdtemp(prefix="wdt_serving_conf_")
        base = Config()  # for train/serving yaml fallbacks
        for name in ("train", "serving", "data_process"):
            src = os.path.join(base.conf_dir, name + ".yaml")
            if os.path.exists(src):
                with open(src) as fsrc, open(
                        os.path.join(conf_dir, name + ".yaml"), "w") as fdst:
                    fdst.write(fsrc.read())
        for name, text in bundle["conf_files"].items():
            with open(os.path.join(conf_dir, name), "w") as fdst:
                fdst.write(text)
        config = Config(conf_dir)
    plan = FeaturePlan(config, multivalue=bundle["train_conf"]["multivalue"],
                       fold=bundle["plan"].get("fold", False),
                       pack_budget=bundle["plan"].get("pack_budget"),
                       # pin the trained fold layout even if the embedded
                       # conf copy is later hand-edited: folded-ness decides
                       # which table carries each wide weight
                       fold_max_rows=bundle["plan"].get("fold_max_rows"))
    model = build_model(config, plan=plan, model_type=bundle["model_type"],
                        n_classes=bundle["n_classes"])
    spec = plan.batch_spec(1, bundle["n_classes"], with_image=model.has_cnn)
    sample = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    # abstract restore target: never materialize an untrained param set
    params, mstate = jax.eval_shape(
        lambda r: model.init(r, sample), jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                            {"params": params, "mstate": mstate})
    restored = ckptr.restore(os.path.join(version_dir, "params"), abstract)
    return model, restored["params"], restored["mstate"], bundle


def latest_version_dir(export_root: str) -> str:
    versions = [d for d in os.listdir(export_root) if d.isdigit()]
    if not versions:
        raise FileNotFoundError(f"no version dirs under {export_root}")
    return os.path.join(export_root, max(versions, key=int))
