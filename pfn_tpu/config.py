"""One typed experiment-config tree.

Replaces the reference's three overlapping config mechanisms (SURVEY.md §5):
(1) argparse + YAML-as-parser-defaults (reference train.py:137-151,154-186),
(2) ``StoreDictKeyPair`` KEY=VAL dicts parsed with ``eval`` (reference
utils.py:99-113 — unsafe; here values go through ``ast.literal_eval``), and
(3) plain config dicts in drivers/notebooks. An :class:`ExperimentConfig` is
a dataclass tree that can be loaded from YAML, overridden with dotted
``a.b=val`` strings, and built into (prior, criterion, TrainConfig, mesh).
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any

from pfn_tpu.train.loop import TrainConfig


@dataclasses.dataclass
class PriorConfig:
    name: str = "gp"
    kwargs: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class CriterionConfig:
    name: str = "barnll"
    kwargs: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class MeshConfig:
    """dp=None means "all remaining devices"; enabled=False disables the
    mesh. sp/ep are the sequence- and expert-parallel axes."""

    dp: int | None = None
    tp: int = 1
    sp: int = 1
    ep: int = 1
    enabled: bool = False


@dataclasses.dataclass
class ExperimentConfig:
    prior: PriorConfig = dataclasses.field(default_factory=PriorConfig)
    criterion: CriterionConfig = dataclasses.field(default_factory=CriterionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    encoder: str | None = None  # registry names; None = model default
    y_encoder: str | None = None
    pos_encoder: str | None = None
    checkpoint_path: str | None = None
    warm_start_from: str | None = None  # parity: load_weights_from_this_state_dict


def _parse_value(text: str) -> Any:
    """Parse an override value: literal if possible, else the raw string.

    Lowercase booleans/null are normalized first — otherwise
    ``--set train.fsdp=false`` would store the truthy STRING 'false' and
    enable the flag."""
    lowered = text.strip().lower()
    if lowered in ("true", "false"):
        return lowered == "true"
    if lowered in ("none", "null"):
        return None
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def apply_overrides(cfg: ExperimentConfig, overrides: list[str]) -> ExperimentConfig:
    """Apply dotted ``section.field=value`` overrides in place.

    ``prior.kwargs.<k>=v`` / ``criterion.kwargs.<k>=v`` address the open
    kwargs dicts (the analog of the reference's ``--extra_prior_kwargs``
    StoreDictKeyPair, train.py:165).
    """
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not of the form a.b=value")
        path, _, raw = ov.partition("=")
        value = _parse_value(raw)
        parts = path.split(".")
        obj: Any = cfg
        for p in parts[:-1]:
            obj = obj[p] if isinstance(obj, dict) else getattr(obj, p)
        last = parts[-1]
        if isinstance(obj, dict):
            obj[last] = value
        else:
            if not hasattr(obj, last):
                raise AttributeError(
                    f"{type(obj).__name__} has no field {last!r} (override {ov!r})"
                )
            setattr(obj, last, value)
    return cfg


def _dataclass_from_dict(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        ftype = fields[k].type
        if isinstance(v, dict) and isinstance(ftype, str):
            sub = {
                "PriorConfig": PriorConfig,
                "CriterionConfig": CriterionConfig,
                "MeshConfig": MeshConfig,
                "TrainConfig": TrainConfig,
            }.get(ftype.split("|")[0].strip())
            if sub is not None:
                kwargs[k] = _dataclass_from_dict(sub, v)
                continue
        kwargs[k] = v
    return cls(**kwargs)


def from_dict(data: dict) -> ExperimentConfig:
    return _dataclass_from_dict(ExperimentConfig, data or {})


def from_yaml(path: str) -> ExperimentConfig:
    """Load an ExperimentConfig from a YAML file (reference --config,
    train.py:146-151)."""
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f)
    return from_dict(data)


def to_dict(cfg: ExperimentConfig) -> dict:
    d = dataclasses.asdict(cfg)
    # TrainConfig carries non-serializable fields (dtype, module factories);
    # drop callables and render the dtype by name.
    t = d["train"]
    for k in ("encoder", "y_encoder", "pos_encoder", "decoder"):
        t.pop(k, None)
    t["dtype"] = getattr(cfg.train.dtype, "__name__", str(cfg.train.dtype))
    return d


def build(cfg: ExperimentConfig):
    """Materialize (prior, criterion, train_cfg, mesh) from the config tree."""
    from pfn_tpu import registries
    from pfn_tpu.parallel.mesh import make_mesh

    prior = registries.PRIORS.get(cfg.prior.name)(**cfg.prior.kwargs)
    crit_kwargs = dict(cfg.criterion.kwargs)
    crit_kwargs.setdefault("seq_len", cfg.train.bptt)
    criterion = registries.CRITERIONS.get(cfg.criterion.name)(prior, **crit_kwargs)
    train_cfg = cfg.train
    if cfg.encoder is not None:
        train_cfg.encoder = registries.ENCODERS.get(cfg.encoder)
    if cfg.y_encoder is not None:
        train_cfg.y_encoder = registries.ENCODERS.get(cfg.y_encoder)
    if cfg.pos_encoder is not None:
        train_cfg.pos_encoder = registries.POS_ENCODERS.get(cfg.pos_encoder)
    mesh = None
    if cfg.mesh.enabled:
        import jax

        n = len(jax.devices())
        denom = cfg.mesh.tp * cfg.mesh.sp * cfg.mesh.ep
        dp = cfg.mesh.dp or max(1, n // denom)
        mesh = make_mesh(dp=dp, tp=cfg.mesh.tp, sp=cfg.mesh.sp, ep=cfg.mesh.ep)
    return prior, criterion, train_cfg, mesh
