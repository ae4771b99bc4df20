"""Checkpointing: orbax save/restore + PyTorch state_dict conversion.

The reference checkpoints ad-hoc with ``torch.save((state_dict, opt_state))``
in notebooks (SURVEY.md §5 "Checkpoint / resume"; BayesianModels ipynb cells
14/16) and supports warm-starting from a state_dict
(``load_weights_from_this_state_dict``, reference train.py:25,46-47). Here:

  * :func:`save_checkpoint` / :func:`restore_checkpoint` — orbax-backed
    checkpoint of (params, opt_state, step, key), restart-safe.
  * :func:`import_torch_state_dict` — convert a reference-style PyTorch
    ``TransformerModel`` state_dict into a PFNTransformer param tree (the
    torch->jax weight-conversion path needed to compare against reference
    checkpoints, SURVEY.md §5).
  * :func:`export_torch_state_dict` — the inverse, for round-trip tests and
    for handing models back to torch users.

Layout notes: torch ``nn.Linear`` stores (out, in) kernels, flax ``Dense``
stores (in, out) -> transpose. Torch MHA packs in_proj rows as [q; k; v]
with head-major D = (H, Dh); our fused qkv Dense packs columns the same way,
so a plain transpose aligns them.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (e.g. {'params':..., 'opt_state':..., 'step':...})."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, template: Any | None = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, target=jax.device_get(template))
        return ckptr.restore(path)


def prune_state_checkpoints(checkpoint_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` epoch_N checkpoints (a full train
    state is ~3x params of f32 — retention control for long runs)."""
    import shutil

    entries = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("epoch_"):
            try:
                entries.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                continue
    for _, name in sorted(entries)[:-keep]:
        shutil.rmtree(os.path.join(checkpoint_dir, name), ignore_errors=True)


def latest_state_checkpoint(checkpoint_dir: str):
    """Find the newest ``epoch_N`` checkpoint under ``checkpoint_dir``.

    Returns (path, epoch) or None. Used by the train loop's automatic
    resume (TrainConfig.checkpoint_dir / checkpoint_every).
    """
    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if name.startswith("epoch_"):
            try:
                epoch = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if best is None or epoch > best[1]:
                best = (os.path.join(checkpoint_dir, name), epoch)
    return best


# ---------------------------------------------------------------------------
# torch <-> flax conversion
# ---------------------------------------------------------------------------

def _t(w) -> np.ndarray:
    return np.asarray(w).T.copy()


def import_torch_state_dict(sd: dict, nlayers: int) -> dict:
    """Map a reference-style torch TransformerModel state_dict into a
    PFNTransformer params tree (names per reference transformer.py:14-26:
    ``encoder`` / ``y_encoder`` Linear, ``transformer_encoder.layers.N`` with
    self_attn {in_proj, out_proj}, linear1/2, norm1/2, and the default
    Sequential decoder ``decoder.{0,2}``).

    Tensors may be torch tensors or numpy arrays.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu() if hasattr(v, "cpu") else v) for k, v in sd.items()}
    p: dict = {}
    p["encoder"] = {"linear": {"kernel": _t(sd["encoder.weight"]), "bias": sd["encoder.bias"].copy()}}
    p["y_encoder"] = {"linear": {"kernel": _t(sd["y_encoder.weight"]), "bias": sd["y_encoder.bias"].copy()}}
    for i in range(nlayers):
        pre = f"transformer_encoder.layers.{i}."
        p[f"layer_{i}"] = {
            "self_attn": {
                "qkv": {
                    "kernel": _t(sd[pre + "self_attn.in_proj_weight"]),
                    "bias": sd[pre + "self_attn.in_proj_bias"].copy(),
                },
                "out_proj": {
                    "kernel": _t(sd[pre + "self_attn.out_proj.weight"]),
                    "bias": sd[pre + "self_attn.out_proj.bias"].copy(),
                },
            },
            "linear1": {"kernel": _t(sd[pre + "linear1.weight"]), "bias": sd[pre + "linear1.bias"].copy()},
            "linear2": {"kernel": _t(sd[pre + "linear2.weight"]), "bias": sd[pre + "linear2.bias"].copy()},
            "norm1": {"scale": sd[pre + "norm1.weight"].copy(), "bias": sd[pre + "norm1.bias"].copy()},
            "norm2": {"scale": sd[pre + "norm2.weight"].copy(), "bias": sd[pre + "norm2.bias"].copy()},
        }
    p["decoder"] = {
        "fc1": {"kernel": _t(sd["decoder.0.weight"]), "bias": sd["decoder.0.bias"].copy()},
        "fc2": {"kernel": _t(sd["decoder.2.weight"]), "bias": sd["decoder.2.bias"].copy()},
    }
    return {"params": jax.tree.map(lambda a: a.astype(np.float32), p)}


def export_torch_state_dict(params: dict, nlayers: int) -> dict:
    """Inverse of :func:`import_torch_state_dict` (numpy arrays out)."""
    p = jax.device_get(params)["params"]
    sd: dict = {}
    sd["encoder.weight"] = _t(p["encoder"]["linear"]["kernel"])
    sd["encoder.bias"] = np.asarray(p["encoder"]["linear"]["bias"])
    sd["y_encoder.weight"] = _t(p["y_encoder"]["linear"]["kernel"])
    sd["y_encoder.bias"] = np.asarray(p["y_encoder"]["linear"]["bias"])
    for i in range(nlayers):
        L = p[f"layer_{i}"]
        pre = f"transformer_encoder.layers.{i}."
        sd[pre + "self_attn.in_proj_weight"] = _t(L["self_attn"]["qkv"]["kernel"])
        sd[pre + "self_attn.in_proj_bias"] = np.asarray(L["self_attn"]["qkv"]["bias"])
        sd[pre + "self_attn.out_proj.weight"] = _t(L["self_attn"]["out_proj"]["kernel"])
        sd[pre + "self_attn.out_proj.bias"] = np.asarray(L["self_attn"]["out_proj"]["bias"])
        sd[pre + "linear1.weight"] = _t(L["linear1"]["kernel"])
        sd[pre + "linear1.bias"] = np.asarray(L["linear1"]["bias"])
        sd[pre + "linear2.weight"] = _t(L["linear2"]["kernel"])
        sd[pre + "linear2.bias"] = np.asarray(L["linear2"]["bias"])
        sd[pre + "norm1.weight"] = np.asarray(L["norm1"]["scale"])
        sd[pre + "norm1.bias"] = np.asarray(L["norm1"]["bias"])
        sd[pre + "norm2.weight"] = np.asarray(L["norm2"]["scale"])
        sd[pre + "norm2.bias"] = np.asarray(L["norm2"]["bias"])
    sd["decoder.0.weight"] = _t(p["decoder"]["fc1"]["kernel"])
    sd["decoder.0.bias"] = np.asarray(p["decoder"]["fc1"]["bias"])
    sd["decoder.2.weight"] = _t(p["decoder"]["fc2"]["kernel"])
    sd["decoder.2.bias"] = np.asarray(p["decoder"]["fc2"]["bias"])
    return sd
