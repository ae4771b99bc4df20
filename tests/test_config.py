"""Config tree + registries + CLI (parity: reference train.py:137-287)."""

import dataclasses

import jax.numpy as jnp
import pytest

from pfn_tpu import config as config_lib
from pfn_tpu import registries
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.train.cli import build_parser, config_from_args


def test_registries_have_reference_entries():
    # Prior registry parity (reference train.py:193-202; stroke added by the
    # stroke prior module).
    for name in ["gp", "ridge", "mix_gp"]:
        assert name in registries.PRIORS
    # Loss registry parity (train.py:221-237).
    for name in [
        "ce", "gaussnll", "mse", "barnll",
        "adaptivebarnll", "adaptivefullsupportbarnll",
    ]:
        assert name in registries.CRITERIONS
    # Positional encodings (train.py:253-269).
    for name in ["none", "sinus", "learned", "paired_scrambled_learned"]:
        assert name in registries.POS_ENCODERS


def test_overrides_typed_and_nested():
    cfg = config_lib.ExperimentConfig()
    config_lib.apply_overrides(
        cfg,
        [
            "train.lr=0.0003",
            "train.nlayers=3",
            "prior.name=ridge",
            "prior.kwargs.noisy_std=0.05",
            "criterion.kwargs.num_buckets=17",
        ],
    )
    assert cfg.train.lr == 3e-4 and cfg.train.nlayers == 3
    assert cfg.prior.name == "ridge"
    assert cfg.prior.kwargs["noisy_std"] == 0.05
    with pytest.raises(AttributeError):
        config_lib.apply_overrides(cfg, ["train.nonexistent=1"])


def test_build_materializes_prior_and_criterion():
    cfg = config_lib.ExperimentConfig()
    cfg.prior.kwargs = {"lengthscale": 0.6, "noise": 1e-4, "outputscale": 1.0}
    cfg.criterion.kwargs = {"num_buckets": 10}
    prior, criterion, train_cfg, mesh = config_lib.build(cfg)
    assert isinstance(prior, GPPrior) and prior.lengthscale == 0.6
    assert criterion.bar.num_bars == 10
    assert mesh is None


def test_adaptive_criterion_estimates_borders_from_prior():
    cfg = config_lib.ExperimentConfig()
    cfg.criterion.name = "adaptivefullsupportbarnll"
    cfg.criterion.kwargs = {"num_buckets": 8, "y_sample_size": 4000}
    cfg.train.bptt = 20
    prior, criterion, _, _ = config_lib.build(cfg)
    borders = criterion.bar.borders
    assert borders.shape == (9,)
    assert bool(jnp.all(jnp.diff(borders) > 0))


def test_yaml_roundtrip(tmp_path):
    yaml = pytest.importorskip("yaml")
    cfg = config_lib.ExperimentConfig()
    cfg.train.bptt = 33
    cfg.prior.name = "ridge"
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(config_lib.to_dict(cfg)))
    # to_dict drops non-serializable fields; reload through from_dict.
    data = yaml.safe_load(path.read_text())
    data["train"].pop("dtype", None)
    loaded = config_lib.from_dict(data)
    assert loaded.train.bptt == 33 and loaded.prior.name == "ridge"


def test_cli_parsing_matches_reference_shapes():
    parser = build_parser()
    args = parser.parse_args(
        ["gp", "--loss_function", "barnll", "--lr", "1e-4",
         "--set", "prior.kwargs.lengthscale=0.6",
         "--set", "mesh.enabled=True"]
    )
    cfg = config_from_args(args)
    assert cfg.prior.name == "gp"
    assert cfg.criterion.name == "barnll"
    assert cfg.train.lr == 1e-4
    assert cfg.prior.kwargs["lengthscale"] == 0.6
    assert cfg.mesh.enabled is True


def test_cli_end_to_end_tiny_train(tmp_path, capsys):
    from pfn_tpu.train.cli import main

    ckpt = tmp_path / "ckpt"
    rc = main(
        ["ridge", "--loss_function", "mse",
         "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "4",
         "--bptt", "8", "--emsize", "16", "--nhid", "32", "--nlayers", "1",
         "--nhead", "2", "--lr", "1e-3", "--warmup_epochs", "1",
         "--checkpoint", str(ckpt)]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "final mean loss" in out and "saved checkpoint" in out
    assert ckpt.exists()


def test_override_lowercase_booleans_and_none():
    """--set train.fsdp=false must disable the flag, not store a truthy
    string; none/null parse to None."""
    from pfn_tpu.config import ExperimentConfig, apply_overrides

    cfg = ExperimentConfig()
    apply_overrides(cfg, ["train.fsdp=false", "train.verbose=true",
                          "train.lr=none"])
    assert cfg.train.fsdp is False
    assert cfg.train.verbose is True
    assert cfg.train.lr is None


def test_ce_criterion_defaults_to_prior_num_outputs():
    from pfn_tpu import registries
    from pfn_tpu.priors.stroke import StrokePrior

    prior = StrokePrior(num_features=16, num_outputs=5)
    crit = registries.CRITERIONS.get("ce")(prior)
    assert crit.num_classes == 5
