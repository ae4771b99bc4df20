"""The PFN transformer.

Behavioral parity: reference transformer.py:13-91 (TransformerModel).
  * Train tokens are encoder(x) + y_encoder(y); eval tokens are encoder(x)
    only (transformer.py:67-74). With a traced ``single_eval_pos`` this is a
    ``where`` over the position index — shapes stay static.
  * PFN attention (every token attends to all train tokens; eval tokens also
    to themselves) is a parameter of the attention op, never a materialized
    mask (cf. transformer.py:35-41,65).
  * Encoder layers are post-LN with GELU activation like
    torch.nn.TransformerEncoderLayer(activation='gelu') (transformer.py:17).
  * The attention out-projection and the second FFN linear of every layer are
    ZERO-initialized (transformer.py:43-53) so the stack starts as the
    identity — the reference's key trainability trick, preserved here.
  * The decoder head (default Linear→GELU→Linear, transformer.py:23) is
    applied to *all* positions; callers mask or slice eval positions (the
    reference slices to [single_eval_pos:], transformer.py:91 — slicing on a
    traced scalar would break static shapes, so the TPU loss masks instead).

TPU-first choices: batch-first (B, T, D) layout; bf16 compute with f32
parameters and f32 softmax/LayerNorm accumulation; attention dispatches to
the Pallas flash kernel when profitable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from pfn_tpu.models.decoders import MLPDecoder
from pfn_tpu.models.encoders import LinearEncoder
from pfn_tpu.models.positional import NoPositionalEncoding
from pfn_tpu.ops.attention import pfn_attention


def _constrain(x, sharding):
    """Apply a sharding constraint if one is configured. Skipped only when a
    sharded dim is SMALLER than its mesh axis (the B=1 tracer in
    init_params — unshardable); merely-uneven dims still get the constraint
    (GSPMD pads). Training-time divisibility is validated up front by
    train() with a clear error, so this never silently degrades a real run."""
    if sharding is None:
        return x
    mesh_shape = sharding.mesh.shape
    for dim, names in zip(x.shape, sharding.spec):
        axis = 1
        for n in (names,) if isinstance(names, str) else (names or ()):
            axis *= mesh_shape[n]
        if dim < axis:
            return x
    return jax.lax.with_sharding_constraint(x, sharding)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    """Static model configuration (the reference's constructor args,
    transformer.py:14)."""

    num_features: int
    n_out: int
    emsize: int = 200
    nhead: int = 2
    nhid: int = 200
    nlayers: int = 6
    dropout: float = 0.0
    input_normalization: bool = False  # SeqBN (transformer.py:24, utils.py:76-86)
    attention_impl: str = "auto"  # 'dense' | 'flash' | 'auto'
    dtype: Any = jnp.float32  # compute dtype; params are always f32
    encoder: Callable | None = None  # module factory (emsize) -> nn.Module
    y_encoder: Callable | None = None
    pos_encoder: Callable | None = None  # factory (max_len) -> nn.Module
    decoder: Callable | None = None  # factory (nhid, n_out) -> nn.Module
    max_len: int = 5000  # for positional-encoding tables
    # Sequence-parallel activation sharding: a NamedSharding for the (B, T, D)
    # token stream (see pfn_tpu.parallel.mesh.token_sharding). Applied after
    # token construction and after every encoder layer so FFN/LayerNorm run
    # sequence-sharded; attention gathers K/V over 'sp' (XLA SPMD).
    token_sharding: Any = None
    # The device mesh, when training under one: non-dense attention then runs
    # inside a shard_map region (ops.attention.pfn_sharded_attention — the
    # composition Pallas requires; GSPMD cannot auto-partition a kernel).
    mesh: Any = None
    # GELU variant: False (default) = tanh approximation (TPU-friendly; the
    # Pallas fused layer implements it). True = exact erf GELU — what
    # torch.nn.TransformerEncoderLayer(activation='gelu') computes
    # (reference transformer.py:17) — used for bit-level checkpoint parity
    # with reference-trained torch models (tests/test_torch_parity.py).
    exact_gelu: bool = False
    # Mixture-of-Experts FFN (0 = dense FFN, the reference architecture).
    # When > 0, every layer's FFN becomes a Switch-style top-1 MoE
    # (models/moe.py); expert_sharding places the dispatched (B, E, C, D)
    # tensor over the 'ep' mesh axis for expert parallelism.
    num_experts: int = 0
    moe_capacity_factor: float = 1.25
    expert_sharding: Any = None


class MultiheadPFNAttention(nn.Module):
    """Multi-head self-attention with the PFN mask rule.

    Combined qkv projection (like torch's in_proj) with xavier-uniform init;
    out-projection zero-initialized (transformer.py:52-53).
    """

    emsize: int
    nhead: int
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    mesh: Any = None

    @nn.compact
    def __call__(self, x, single_eval_pos):
        B, T, D = x.shape
        assert D % self.nhead == 0
        head_dim = D // self.nhead
        qkv = nn.Dense(
            3 * D,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="qkv",
        )(x)
        qkv = qkv.reshape(B, T, 3, self.nhead, head_dim)
        q, k, v = (
            qkv[:, :, 0].transpose(0, 2, 1, 3),
            qkv[:, :, 1].transpose(0, 2, 1, 3),
            qkv[:, :, 2].transpose(0, 2, 1, 3),
        )  # (B, H, T, Dh)
        out = pfn_attention(
            q, k, v, single_eval_pos, impl=self.attention_impl,
            mesh=self.mesh,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(
            D,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,  # zero-init trick
            name="out_proj",
        )(out)


class PFNEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with GELU FFN, parity with
    torch.nn.TransformerEncoderLayer(activation='gelu') plus the zero-init of
    linear2 (transformer.py:50-51). With ``num_experts > 0`` the FFN is a
    Switch-style top-1 MoE (models/moe.py) instead."""

    emsize: int
    nhead: int
    nhid: int
    dropout: float = 0.0
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    mesh: Any = None
    exact_gelu: bool = False
    num_experts: int = 0
    moe_capacity_factor: float = 1.25
    expert_sharding: Any = None

    @nn.compact
    def __call__(self, x, single_eval_pos, deterministic: bool = True):
        attn = MultiheadPFNAttention(
            self.emsize,
            self.nhead,
            dtype=self.dtype,
            attention_impl=self.attention_impl,
            mesh=self.mesh,
            name="self_attn",
        )(x, single_eval_pos)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        # eps 1e-5 = torch nn.LayerNorm default (checkpoint parity with the
        # reference; flax's own default is 1e-6).
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x + attn)
        if self.num_experts > 0:
            assert self.dropout == 0.0, (
                "MoEFFN has no counterpart to the dense path's FFN-internal "
                "dropout — train MoE models with dropout=0"
            )
            from pfn_tpu.models.moe import MoEFFN

            h = MoEFFN(
                self.emsize,
                self.nhid,
                self.num_experts,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype,
                expert_sharding=self.expert_sharding,
                name="moe",
            )(x)
        else:
            h = nn.Dense(self.nhid, dtype=self.dtype, name="linear1")(x)
            h = nn.gelu(h, approximate=not self.exact_gelu)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(
                self.emsize,
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,  # zero-init trick
                name="linear2",
            )(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x + h)


class SeqBN(nn.Module):
    """Normalization over the flattened (B*T, D) sequence with learned
    affine (reference utils.py:76-86; optional input normalization,
    transformer.py:24).

    Deviation from torch BatchNorm1d: stats are ALWAYS the current batch's
    (no running averages). Running stats would need a mutable flax
    collection threaded through the jitted train step, and — worse — would
    be silently gradient-updated by the optimizer if stored in params. PFN
    batches are thousands of i.i.d. samples, so batch stats are already
    tight estimates at train AND eval time.
    """

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, D = x.shape
        flat = x.reshape(B * T, D)
        mean = jnp.mean(flat, axis=0)
        var = jnp.var(flat, axis=0)
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        flat = (flat - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return flat.reshape(B, T, D)


class PFNTransformer(nn.Module):
    """The PFN: ``apply(params, x, y, single_eval_pos)`` -> (B, T, n_out).

    x: (B, T, F) float features; y: (B, T) float targets (labels are floats
    too, matching the reference's Linear y-encoder on y.unsqueeze(-1),
    transformer.py:69). ``single_eval_pos`` may be a Python int or a traced
    scalar. Output covers ALL positions; positions < single_eval_pos are
    train tokens whose outputs are ignored by the loss.
    """

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, y, single_eval_pos, deterministic: bool = True):
        cfg = self.config
        B, T, _ = x.shape
        enc = (cfg.encoder or LinearEncoder)(cfg.emsize, name="encoder")
        y_enc = (cfg.y_encoder or LinearEncoder)(cfg.emsize, name="y_encoder")

        x_emb = enc(x.astype(cfg.dtype))
        y_emb = y_enc(y[..., None].astype(cfg.dtype))
        pos = jnp.arange(T)[None, :, None]
        tokens = x_emb + jnp.where(pos < single_eval_pos, y_emb, 0.0)
        tokens = _constrain(tokens, cfg.token_sharding)

        if cfg.input_normalization:
            tokens = SeqBN(name="input_ln")(tokens, deterministic=deterministic)

        pos_encoder = (cfg.pos_encoder or NoPositionalEncoding)(
            max_len=cfg.max_len, name="pos_encoder"
        )
        tokens = pos_encoder(tokens, deterministic=deterministic)

        for i in range(cfg.nlayers):
            tokens = PFNEncoderLayer(
                cfg.emsize,
                cfg.nhead,
                cfg.nhid,
                cfg.dropout,
                dtype=cfg.dtype,
                attention_impl=cfg.attention_impl,
                mesh=cfg.mesh,
                exact_gelu=cfg.exact_gelu,
                num_experts=cfg.num_experts,
                moe_capacity_factor=cfg.moe_capacity_factor,
                expert_sharding=cfg.expert_sharding,
                name=f"layer_{i}",
            )(tokens, single_eval_pos, deterministic=deterministic)
            tokens = _constrain(tokens, cfg.token_sharding)

        if cfg.decoder is not None:
            decoder = cfg.decoder(cfg.nhid, cfg.n_out, name="decoder")
        else:
            decoder = MLPDecoder(
                cfg.nhid, cfg.n_out, approximate=not cfg.exact_gelu,
                name="decoder",
            )
        return decoder(tokens.astype(jnp.float32))

    # ---- convenience -------------------------------------------------------
    def init_params(self, key: jax.Array, seq_len: int = 8):
        cfg = self.config
        x = jnp.zeros((1, seq_len, cfg.num_features))
        y = jnp.zeros((1, seq_len))
        variables = self.init(key, x, y, seq_len // 2)
        # Drop sown collections (MoE aux losses) — they are per-forward
        # outputs, not state.
        return {k: v for k, v in variables.items() if k != "moe_aux"}


def num_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
