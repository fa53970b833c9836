"""Shared entry-point assembly: config -> mesh -> model/loss/metrics/loaders.

Mirrors the reference entry-point skeleton (train_dist_multi.py:20-90):
tokenizer, train + val dataloaders (with the split/cut swap rules at
init_dataloaders :93-128), model, loss, metrics, optimizer, writer,
visualizer — but the NCCL rendezvous (:33-38) becomes mesh construction.
"""
from __future__ import annotations

import copy
import logging
from typing import List, Tuple

import jax

from demovlp_tpu.utils.platform import pin_platform_from_env

pin_platform_from_env()

from demovlp_tpu.config import ConfigParser
from demovlp_tpu.data.tokenizer import build_tokenizer
from demovlp_tpu.models.distilbert import DistilBertConfig
from demovlp_tpu.parallel import create_mesh, setup_distributed
from demovlp_tpu.train.optim import make_optimizer
from demovlp_tpu.utils.writer import MetricsWriter
from demovlp_tpu import registry

logger = logging.getLogger(__name__)


def build_mesh(config: ConfigParser):
    from demovlp_tpu.utils.cache import enable_compile_cache

    # multi-host init FIRST: enable_compile_cache keys the cache dir off the
    # backend (jax.extend.backend.get_backend()), and any backend use before
    # jax.distributed.initialize breaks multi-host startup
    setup_distributed()
    enable_compile_cache()
    # (dropout rbg keys are created per-trainer via utils.prng.fast_prng_key —
    # never a global jax_default_prng_impl flip, which leaks across the process)
    backend = config.get("ops", {}).get("xattn_backend")
    if backend:
        from demovlp_tpu.ops import xattn

        xattn.set_backend(backend)
    model_axis = int(config.get("mesh", {}).get("model", 1))
    return create_mesh(model=model_axis)


def build_model(config: ConfigParser, mesh=None):
    """Construct the arch from its config section, translating the reference's
    nested object_params/text_params into the flax module's flat fields."""
    arch = config["arch"]
    args = arch.get("args", {})
    obj_p = args.get("object_params", {})
    txt_p = args.get("text_params", {})
    kwargs = dict(
        object_num=int(obj_p.get("object_num", 30)),
        num_frames=int(obj_p.get("num_frames", 4)),
        time_module=obj_p.get("time_module") or None,
        projection_dim=int(args.get("projection_dim", 256)),
    )
    if "num_label" in obj_p:
        kwargs["num_label"] = int(obj_p["num_label"])
    if "head_dropout" in obj_p:  # QA-only (BUTD attention dropout)
        kwargs["head_dropout"] = float(obj_p["head_dropout"])
    for src, dst in (
        ("embed_dim", "object_embed_dim"),
        ("depth", "object_depth"),
        ("heads", "object_heads"),
    ):
        if src in obj_p:
            kwargs[dst] = int(obj_p[src])
    text_cfg_overrides = txt_p.get("config", {})
    if text_cfg_overrides:
        kwargs["text_config"] = DistilBertConfig(**text_cfg_overrides)
    if float((config.get("mlm", {}) or {}).get("weight", 0.0)) > 0:
        kwargs["with_mlm"] = True
    precision = config.get("precision", {})
    dtype = precision.get("compute", "float32")
    if dtype != "float32":
        import jax.numpy as jnp

        kwargs["dtype"] = getattr(jnp, dtype)
    norm_dtype = precision.get("norm", "float32")
    if norm_dtype != "float32":
        import jax.numpy as jnp

        kwargs["norm_dtype"] = getattr(jnp, norm_dtype)
    # region-tower attention form: "xla" (grouped) | "dense" (masked full
    # attention — same math, fewer layout ops at multi-frame shapes)
    if obj_p.get("attn_impl"):
        if obj_p["attn_impl"] == "pallas":
            # retired config value: the prototype kernel never ran on
            # compiled TPU (Mosaic lowering failure at f=1/k=30) and
            # measured no win over XLA in interpret mode — reject at build
            # time instead of shipping a knob whose only behavior is raise
            raise ValueError(
                "object_params.attn_impl='pallas' was removed; the kernel "
                "remains a test-only artifact (ops/pallas_attention.py). "
                "Use 'dense' (default) or 'xla'."
            )
        kwargs["attn_impl"] = obj_p["attn_impl"]
    if config.get("remat"):
        kwargs["remat"] = True
    registry._populate()
    ctor = registry.lookup("arch", arch["type"])
    # QA arch requires num_label; retrieval/MC ignore it (same for the
    # QA-head dropout knob)
    if arch["type"] != "ObjectQARelation":
        kwargs.pop("num_label", None)
        kwargs.pop("head_dropout", None)
    model = ctor(**kwargs)
    return model


def build_loss(config: ConfigParser):
    return config.initialize("loss")


def build_metrics(config: ConfigParser) -> List:
    registry._populate()
    return [registry.lookup("metric", name) for name in config["metrics"]]


def build_optimizer(config: ConfigParser):
    opt_args = dict(config["optimizer"].get("args", {}))
    lr = float(opt_args.pop("lr", 1e-5))
    if opt_args.get("pack_small") and int(
        config.get("mesh", {}).get("model", 1)
    ) > 1:
        # PackedState hides the leaf names parallel/tp.py matches on, so
        # mu/nu for ALL leaves — the big matrices included — would silently
        # fall back to replicated: ~model-axis x the optimizer-state HBM per
        # chip. Fail loudly instead of OOMing mysteriously.
        raise ValueError(
            "optimizer.args.pack_small is a data-parallel knob and is not "
            "supported with tensor parallelism (mesh.model > 1); remove one."
        )
    return make_optimizer(lr=lr, **opt_args)


def init_dataloaders(
    config: ConfigParser, val_split: str = "val", train: bool = True
) -> Tuple[List, List]:
    """Train loaders from the config (list or single), and val loaders with
    the reference's swap rules (train_dist_multi.py:93-128): split->val,
    CC3M subsampled to 1%, LSMDC MC gets split 'val' batch 1.

    train=False skips train-loader construction entirely (no train-split
    metadata reads, no CC3M subsampling) — the serving CLIs are forward-only
    and only need the val side."""
    train_loaders = config.initialize_list("data_loader") if train else []

    section = config["data_loader"]
    sections = section if isinstance(section, list) else [section]
    val_loaders = []
    for i, sec in enumerate(sections):
        new_sec = copy.deepcopy(dict(sec))
        new_args = new_sec.get("args", {})
        new_args["split"] = val_split
        new_args["shuffle"] = False
        dataset_name = new_args.get("dataset_name", "")
        if dataset_name == "ConceptualCaptions3MObjectSelect":
            new_args["subsample"] = 0.01
        if dataset_name == "LSMDCMCObjectSelect":
            new_args["split"] = "val"
            new_args["batch_size"] = 1
        registry._populate()
        ctor = registry.lookup("data_loader", new_sec["type"])
        val_loaders.append(ctor(**new_args))
    return train_loaders, val_loaders


def load_pretrained_into(config: ConfigParser, params):
    """arch.args.load_checkpoint transfer loading (reference model/model.py:
    49-62): a reference .pth is converted on the fly (incl. temporal-embed
    inflation per load_temporal_fix), an orbax dir is restored directly.
    Returns the (possibly replaced) params pytree."""
    args = config["arch"].get("args", {})
    ckpt = args.get("load_checkpoint", "")
    if not ckpt:
        return params
    from pathlib import Path

    path = Path(ckpt)
    if path.suffix in (".pth", ".pt", ".bin"):
        from demovlp_tpu.convert import load_reference_checkpoint

        obj_p = args.get("object_params", {})
        params = load_reference_checkpoint(
            str(path),
            num_frames=int(obj_p.get("num_frames", 4)),
            temporal_fix=args.get("load_temporal_fix", "zeros"),
        )
    else:
        import orbax.checkpoint as ocp

        target = path / "params" if (path / "params").exists() else path
        params = ocp.StandardCheckpointer().restore(target.absolute(), params)
    logger.info("Loaded pretrained params from %s", ckpt)
    return params


def load_pretrained_params(config: ConfigParser, state):
    """load_pretrained_into over a TrainState; optimizer state stays fresh.
    Identity no-op when arch.args.load_checkpoint is unset (callers rely on
    `is` to detect that nothing was loaded)."""
    params = load_pretrained_into(config, state.params)
    if params is state.params:
        return state
    return state.replace(params=params)


def build_serving_params(config: ConfigParser, model, template, mesh,
                         resume: str = ""):
    """Params for a forward-only (serving) job.

    Without a trainer-checkpoint resume, this never builds an optimizer or a
    TrainState — half the parameter-memory footprint of create_train_state,
    which also materializes Adam mu/nu. With `resume`, the full TrainState is
    reconstructed as a restore template and only its params are kept."""
    from pathlib import Path

    import jax

    from demovlp_tpu.train.checkpoint import CheckpointManager
    from demovlp_tpu.train.state import create_train_state

    if resume:
        state = create_train_state(
            model, build_optimizer(config), template, jax.random.PRNGKey(0),
            mesh,
        )
        state = load_pretrained_params(config, state)
        state, _ = CheckpointManager(Path(resume).parent).restore(resume, state)
        return state.params
    params = model.init(jax.random.PRNGKey(0), template)
    params = load_pretrained_into(config, params)
    from demovlp_tpu.parallel.mesh import replicated_sharding
    from demovlp_tpu.parallel.tp import has_model_axis, shard_state

    if mesh is not None:
        if has_model_axis(mesh):
            return shard_state(params, mesh)
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated_sharding(mesh))
            if hasattr(x, "shape") else x,
            params,
        )
    return params


def build_writer(config: ConfigParser, experiment=None):
    if jax.process_index() != 0:
        return None
    # reference parity: trainer.neptune routes scalars through an experiment
    # object in addition to the local sinks (train_dist_multi.py:72-75)
    if config.get("trainer", {}).get("neptune"):
        from demovlp_tpu.utils.writer import ExperimentWriter

        return ExperimentWriter(config.log_dir, experiment=experiment)
    return MetricsWriter(config.log_dir)


def build_visualizer(config: ConfigParser):
    vis_cfg = config.get("visualizer", {}) or {}
    if not vis_cfg.get("type"):
        return None
    return config.initialize(
        "visualizer",
        exp_name=config["name"],
        web_dir=str(config.web_log_dir),
    )


def build_tokenizer_from_config(config: ConfigParser):
    model_path = (
        config["arch"].get("args", {}).get("text_params", {}).get("model", "")
    )
    return build_tokenizer(model_path)
