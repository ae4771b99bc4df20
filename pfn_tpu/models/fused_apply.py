"""Functional fast-path forward: PFNTransformer semantics with the fused
encoder-layer Pallas kernels (ops.fused_layer) for the layer stack.

Consumes the SAME variables pytree that ``PFNTransformer.init_params``
produces (checkpoint-compatible — no conversion); embed and decoder run
through the ordinary flax modules (they are <2% of FLOPs and exactly match
the reference semantics, transformer.py:67-82), while each ``layer_{i}``
executes as the fused kernel. Enabled per-config via
``TrainConfig(attention_impl="fused")``; the train loop dispatches here in
``_apply_with_aux``.

Supported subset = the flagship training configs: default Linear x/y
encoders, no positional encoding, no SeqBN, dropout 0, dense FFN (no MoE),
single device (no token sharding / mesh). Anything else raises — fall back
to ``attention_impl='auto'`` for those.
"""

from __future__ import annotations

import jax.numpy as jnp

from pfn_tpu.models.decoders import MLPDecoder
from pfn_tpu.models.encoders import LinearEncoder
from pfn_tpu.models.positional import NoPositionalEncoding
from pfn_tpu.models.transformer import TransformerConfig
from pfn_tpu.ops.fused_layer import fused_encoder_layer


def fused_supported(cfg: TransformerConfig) -> str | None:
    """None if the fused path can run this config, else the reason not."""
    checks = [
        (cfg.encoder in (None, LinearEncoder), "custom x-encoder"),
        (cfg.y_encoder in (None, LinearEncoder), "custom y-encoder"),
        (cfg.pos_encoder in (None, NoPositionalEncoding), "positional encoding"),
        (cfg.decoder in (None, MLPDecoder), "custom decoder"),
        (not cfg.input_normalization, "SeqBN input normalization"),
        (cfg.dropout == 0.0, "dropout > 0"),
        (cfg.num_experts == 0, "MoE FFN"),
        (not cfg.exact_gelu, "exact (erf) GELU — kernel implements tanh"),
        (cfg.mesh is None and cfg.token_sharding is None, "multi-device mesh"),
        (cfg.emsize % cfg.nhead == 0, "emsize % nhead != 0"),
    ]
    for ok, reason in checks:
        if not ok:
            return reason
    return None


def _layer_params(lp):
    return {
        "wqkv": lp["self_attn"]["qkv"]["kernel"],
        "bqkv": lp["self_attn"]["qkv"]["bias"],
        "wout": lp["self_attn"]["out_proj"]["kernel"],
        "bout": lp["self_attn"]["out_proj"]["bias"],
        "ln1_g": lp["norm1"]["scale"],
        "ln1_b": lp["norm1"]["bias"],
        "w1": lp["linear1"]["kernel"],
        "b1": lp["linear1"]["bias"],
        "w2": lp["linear2"]["kernel"],
        "b2": lp["linear2"]["bias"],
        "ln2_g": lp["norm2"]["scale"],
        "ln2_b": lp["norm2"]["bias"],
    }


def fused_forward(
    cfg: TransformerConfig, variables, x, y, single_eval_pos, interpret=False
):
    """PFNTransformer.apply, with the layer stack on the fused kernels."""
    reason = fused_supported(cfg)
    if reason is not None:
        raise ValueError(f"fused path does not support this config: {reason}")
    P = variables["params"]
    T = x.shape[1]
    if T > 512:
        # The fused kernels hold a whole item's (T, T) scores and (T, 3D)
        # qkv in VMEM — the short-sequence regime. Long sequences belong to
        # the flash kernel (ops/flash_attention.py), which tiles T.
        raise ValueError(
            f"fused path is for short sequences (T <= 512, got {T}) — use "
            "attention_impl='flash' for the long-context regime"
        )

    # Embed (exact flax modules -> exact reference semantics).
    x_emb = LinearEncoder(cfg.emsize).apply(
        {"params": P["encoder"]}, x.astype(cfg.dtype)
    )
    y_emb = LinearEncoder(cfg.emsize).apply(
        {"params": P["y_encoder"]}, y[..., None].astype(cfg.dtype)
    )
    pos = jnp.arange(T)[None, :, None]
    tokens = x_emb + jnp.where(pos < single_eval_pos, y_emb, 0.0)

    for i in range(cfg.nlayers):
        tokens = fused_encoder_layer(
            tokens,
            _layer_params(P[f"layer_{i}"]),
            single_eval_pos,
            cfg.nhead,
            cfg.dtype,
            interpret,
        )

    return MLPDecoder(cfg.nhid, cfg.n_out).apply(
        {"params": P["decoder"]}, tokens.astype(jnp.float32)
    )
