"""Command-line training entry point: ``python -m pfn_tpu.train``.

Parity: reference train.py.__main__ (train.py:154-287) — two-stage parsing
(optional YAML config file supplies defaults, flags override; reference
_parse_args train.py:137-151), prior registry (:193-202), loss registry with
adaptive bucket estimation (:205-237), encoder / positional-encoding /
eval-pos-sampler registries (:241-280) — all routed through
``pfn_tpu.config`` + ``pfn_tpu.registries`` instead of inline if/elif.
"""

from __future__ import annotations

import argparse

from pfn_tpu import config as config_lib
from pfn_tpu import registries


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pfn_tpu.train",
        description="Meta-train a PFN on a synthetic prior (TPU-native).",
    )
    p.add_argument(
        "prior",
        nargs="?",
        default=None,
        choices=registries.PRIORS.names() + [None],
        help="prior name (reference train.py:193-202)",
    )
    p.add_argument("--config", default=None, help="YAML ExperimentConfig file")
    p.add_argument(
        "--loss_function",
        default=None,
        choices=registries.CRITERIONS.names(),
        help="criterion name (reference train.py:221-237)",
    )
    p.add_argument(
        "--set",
        dest="overrides",
        action="append",
        default=[],
        metavar="a.b=value",
        help="dotted config override, e.g. train.lr=3e-4 or "
        "prior.kwargs.lengthscale=0.6 (replaces StoreDictKeyPair, "
        "reference utils.py:99-113)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the env pins JAX_PLATFORMS; only an "
        "in-process jax.config update overrides it — same flag as the "
        "experiment drivers)",
    )
    p.add_argument("--checkpoint", default=None, help="save trained params here")
    p.add_argument(
        "--warm_start", default=None,
        help="checkpoint to initialize params from (parity: "
        "load_weights_from_this_state_dict, reference train.py:25,46-47)",
    )
    # Frequently used scalars as first-class flags (reference train.py:158-184).
    for flag, typ in [
        ("lr", float), ("epochs", int), ("batch_size", int), ("bptt", int),
        ("emsize", int), ("nhid", int), ("nlayers", int), ("nhead", int),
        ("dropout", float), ("steps_per_epoch", int), ("seed", int),
        ("aggregate_k_gradients", int), ("warmup_epochs", int),
    ]:
        p.add_argument(f"--{flag}", type=typ, default=None)
    return p


def config_from_args(args) -> config_lib.ExperimentConfig:
    cfg = (
        config_lib.from_yaml(args.config)
        if args.config
        else config_lib.ExperimentConfig()
    )
    if args.prior is not None:
        cfg.prior.name = args.prior
    if args.loss_function is not None:
        cfg.criterion.name = args.loss_function
    for flag in (
        "lr", "epochs", "batch_size", "bptt", "emsize", "nhid", "nlayers",
        "nhead", "dropout", "steps_per_epoch", "seed",
        "aggregate_k_gradients", "warmup_epochs",
    ):
        v = getattr(args, flag)
        if v is not None:
            setattr(cfg.train, flag, v)
    config_lib.apply_overrides(cfg, args.overrides)
    if args.checkpoint is not None:
        cfg.checkpoint_path = args.checkpoint
    if args.warm_start is not None:
        cfg.warm_start_from = args.warm_start
    return cfg


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cfg = config_from_args(args)
    prior, criterion, train_cfg, mesh = config_lib.build(cfg)

    from pfn_tpu.train.loop import train

    init_params = None
    if cfg.warm_start_from:
        from pfn_tpu.train.checkpoints import restore_checkpoint

        init_params = restore_checkpoint(cfg.warm_start_from)
        print(f"warm-started params from {cfg.warm_start_from}")

    result = train(prior, criterion, train_cfg, mesh=mesh, init_params=init_params)
    print(f"final mean loss {result.final_loss:.5f}")

    if cfg.checkpoint_path:
        from pfn_tpu.train.checkpoints import save_checkpoint

        save_checkpoint(cfg.checkpoint_path, result.params)
        print(f"saved checkpoint to {cfg.checkpoint_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
