"""Retrieval training entry point.

Usage (same surface as the reference train_dist_multi.py, README.md:117):
  python -m demovlp_tpu.cli.train -c configs/ft/msrvtt_o2t-select.json -sc 30 40
Multi-host replaces torch.distributed.launch with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
"""
from __future__ import annotations

from demovlp_tpu.cli.common import (
    build_loss,
    build_mesh,
    build_metrics,
    build_model,
    build_optimizer,
    build_tokenizer_from_config,
    build_visualizer,
    build_writer,
    init_dataloaders,
)
from demovlp_tpu.config import ConfigParser, build_argparser
from demovlp_tpu.train import RetrievalTrainer


def run(config: ConfigParser, args) -> dict:
    mesh = build_mesh(config)
    tokenizer = build_tokenizer_from_config(config)
    train_loaders, val_loaders = init_dataloaders(config, val_split="val")
    model = build_model(config, mesh)
    loss = build_loss(config)
    metrics = build_metrics(config)
    tx = build_optimizer(config)

    trainer = RetrievalTrainer(
        model,
        loss,
        metrics,
        tx,
        config,
        mesh,
        data_loader=train_loaders,
        valid_data_loader=val_loaders,
        tokenizer=tokenizer,
        writer=build_writer(config),
        visualizer=build_visualizer(config),
        max_samples_per_epoch=config["trainer"].get("max_samples_per_epoch", 50000),
        schedule=args.schedule,
        learning_rate1=args.learning_rate1,
        lr_mode=config.get("trainer", {}).get("lr_mode", "reference"),
        rng_seed=args.seed,
    )
    from demovlp_tpu.cli.common import load_pretrained_params

    trainer.state = load_pretrained_params(config, trainer.state)
    resume = config.resume or config["trainer"].get("resume")
    if resume == "auto":
        from demovlp_tpu.train.checkpoint import find_latest_checkpoint

        resume = find_latest_checkpoint(
            config["trainer"]["save_dir"], config["name"]
        )
    if resume:
        trainer.resume(resume)
    return trainer.train()


def main() -> None:
    parser = build_argparser()
    args = parser.parse_args()
    config = ConfigParser(args)
    run(config, args)


if __name__ == "__main__":
    main()
