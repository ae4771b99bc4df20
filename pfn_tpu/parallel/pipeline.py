"""Pipeline parallelism (GPipe-style) for the PFN encoder stack.

The reference has no distributed execution at all (SURVEY.md §2: single
``cuda:0``, no NCCL/MPI). The TPU-native pipeline shards the *layer stack*
over a ``pp`` mesh axis: device s holds ``nlayers / pp`` consecutive encoder
layers; activations flow stage-to-stage over ICI via ``lax.ppermute`` in a
shift-register schedule (the standard JAX pipelining idiom), microbatching
the dataset batch to fill the pipeline. Embedding and decoder head are tiny
(<2% of params) and run replicated outside the pipelined stack.

Everything is differentiable: ``jax.grad`` through ``shard_map`` transposes
the ``ppermute`` into the reverse schedule, so one ``jax.jit`` still contains
sample + forward + backward + update. Combine with data parallelism via a
('dp', 'pp') mesh — the batch axis shards over 'dp' as usual.

Schedule: stage s processes microbatch m at tick t = m + s; a full forward
is ``num_micro + pp - 1`` ticks. Bubble fraction = (pp-1)/(num_micro+pp-1),
the GPipe trade-off — pick num_micro >= ~4*pp for >75% utilization.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pfn_tpu.ops.shard_compat import shard_map

from pfn_tpu.models.decoders import MLPDecoder
from pfn_tpu.models.encoders import LinearEncoder
from pfn_tpu.models.positional import NoPositionalEncoding
from pfn_tpu.models.transformer import PFNEncoderLayer, TransformerConfig


def make_pp_mesh(dp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """A ('dp', 'pp') mesh for pipelined training."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert dp * pp == n, f"dp*pp={dp * pp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, axis_names=("dp", "pp"))


class PFNEmbed(nn.Module):
    """Token construction (reference transformer.py:67-82): encoder(x) +
    y_encoder(y) on train tokens, optional positional encoding."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, y, single_eval_pos):
        cfg = self.config
        enc = (cfg.encoder or LinearEncoder)(cfg.emsize, name="encoder")
        y_enc = (cfg.y_encoder or LinearEncoder)(cfg.emsize, name="y_encoder")
        x_emb = enc(x.astype(cfg.dtype))
        y_emb = y_enc(y[..., None].astype(cfg.dtype))
        pos = jnp.arange(x.shape[1])[None, :, None]
        tokens = x_emb + jnp.where(pos < single_eval_pos, y_emb, 0.0)
        pos_encoder = (cfg.pos_encoder or NoPositionalEncoding)(
            max_len=cfg.max_len, name="pos_encoder"
        )
        return pos_encoder(tokens)


class PFNEncoderStage(nn.Module):
    """``layers_per_stage`` consecutive PFNEncoderLayers — one pipeline
    stage. Layer param names match PFNTransformer's ``layer_{i}`` so trained
    single-device params convert losslessly (see ``to_pipeline_params``)."""

    config: TransformerConfig
    layers_per_stage: int

    @nn.compact
    def __call__(self, x, single_eval_pos):
        cfg = self.config
        for i in range(self.layers_per_stage):
            x = PFNEncoderLayer(
                cfg.emsize,
                cfg.nhead,
                cfg.nhid,
                0.0,
                dtype=cfg.dtype,
                attention_impl=cfg.attention_impl,
                name=f"layer_{i}",
            )(x, single_eval_pos)
        return x


@dataclasses.dataclass
class PipelinedPFN:
    """A PFN whose encoder stack executes as a ``pp``-stage pipeline.

    Params are a dict ``{embed, stages, decoder}`` where every ``stages``
    leaf carries a leading stage axis (pp,), sharded over the 'pp' mesh
    axis. ``apply(params, x, y, sep)`` matches ``PFNTransformer.apply``
    semantics (returns (B, T, n_out) over all positions); dropout is not
    supported on the pipelined path (the flagship configs train without it).
    """

    config: TransformerConfig
    mesh: Mesh
    num_micro: int

    def __post_init__(self):
        cfg = self.config
        self.pp = int(self.mesh.shape["pp"])
        assert cfg.nlayers % self.pp == 0, (
            f"nlayers={cfg.nlayers} must divide over pp={self.pp} stages"
        )
        assert cfg.dropout == 0.0, "pipelined path is dropout-free"
        assert not cfg.input_normalization, (
            "SeqBN is whole-batch normalization — incompatible with microbatch "
            "pipelining"
        )
        assert cfg.token_sharding is None, (
            "sequence-parallel token sharding uses a ('dp','sp','tp') mesh; "
            "the pipeline uses ('dp','pp')"
        )
        assert cfg.num_experts == 0, (
            "MoE layers sow an aux loss the pipelined stage_apply would "
            "silently drop — combine ep with dp/tp/sp instead"
        )
        self.layers_per_stage = cfg.nlayers // self.pp
        self.embed = PFNEmbed(cfg)
        self.stage = PFNEncoderStage(cfg, self.layers_per_stage)
        self.decoder_mod = (cfg.decoder or MLPDecoder)(cfg.nhid, cfg.n_out)

    # ---- params -------------------------------------------------------------
    def init_params(self, key: jax.Array, seq_len: int = 8):
        cfg = self.config
        k_embed, k_stage, k_dec = jax.random.split(key, 3)
        x = jnp.zeros((1, seq_len, cfg.num_features))
        y = jnp.zeros((1, seq_len))
        embed = self.embed.init(k_embed, x, y, seq_len // 2)
        tokens = jnp.zeros((1, seq_len, cfg.emsize))
        stage_keys = jax.random.split(k_stage, self.pp)
        stages = jax.vmap(lambda k: self.stage.init(k, tokens, seq_len // 2))(
            stage_keys
        )
        decoder = self.decoder_mod.init(k_dec, tokens)
        return {"embed": embed, "stages": stages, "decoder": decoder}

    def place_params(self, params):
        sh = {
            "embed": NamedSharding(self.mesh, P()),
            "stages": NamedSharding(self.mesh, P("pp")),
            "decoder": NamedSharding(self.mesh, P()),
        }
        return {
            k: jax.device_put(v, jax.tree.map(lambda _: sh[k], v))
            for k, v in params.items()
        }

    # ---- forward ------------------------------------------------------------
    def apply(self, params, x, y, single_eval_pos):
        tokens = self.embed.apply(params["embed"], x, y, single_eval_pos)
        tokens = self._pipeline(params["stages"], tokens, single_eval_pos)
        return self.decoder_mod.apply(params["decoder"], tokens.astype(jnp.float32))

    def _pipeline(self, stage_params, tokens, single_eval_pos):
        """Shift-register pipeline over the 'pp' axis."""
        M, S = self.num_micro, self.pp
        B = tokens.shape[0]
        assert B % M == 0, f"batch {B} must divide into {M} microbatches"
        mB = B // M
        dp = self.mesh.shape.get("dp", 1)
        assert mB % dp == 0, (
            f"per-microbatch size {mB} (batch {B} / {M} microbatches) must "
            f"divide the dp axis ({dp}) to shard over the mesh — adjust "
            "batch_size or num_micro"
        )
        micro = tokens.reshape(M, mB, *tokens.shape[1:])
        sep = jnp.asarray(single_eval_pos, jnp.int32)
        stage_apply = self.stage.apply

        has_dp = self.mesh.shape.get("dp", 1) > 1
        data_spec = P(None, "dp") if has_dp else P(None)

        def local(stage_p, micro_local, sep):
            # stage_p leaves arrive as (1, ...) — this device's stage slice.
            stage_p = jax.tree.map(lambda a: a[0], stage_p)
            s = jax.lax.axis_index("pp")
            perm = [(i, (i + 1) % S) for i in range(S)]

            def tick(carry, t):
                state, outputs = carry
                mc_in = jnp.clip(t, 0, M - 1)
                feed = jax.lax.dynamic_index_in_dim(
                    micro_local, mc_in, axis=0, keepdims=False
                )
                x_in = jnp.where(s == 0, feed, state)
                out = stage_apply(stage_p, x_in, sep)
                # Last stage emits microbatch m = t - (S-1) when valid.
                m = t - (S - 1)
                mc_out = jnp.clip(m, 0, M - 1)
                valid = (s == S - 1) & (m >= 0)
                cur = jax.lax.dynamic_index_in_dim(
                    outputs, mc_out, axis=0, keepdims=False
                )
                outputs = jax.lax.dynamic_update_index_in_dim(
                    outputs, jnp.where(valid, out, cur), mc_out, axis=0
                )
                state = jax.lax.ppermute(out, "pp", perm)
                return (state, outputs), None

            init = (
                jnp.zeros_like(micro_local[0]),
                jnp.zeros_like(micro_local),
            )
            (_, outputs), _ = jax.lax.scan(
                tick, init, jnp.arange(M + S - 1), unroll=False
            )
            # Only the last stage holds real outputs (zeros elsewhere).
            return jax.lax.psum(
                jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs)), "pp"
            )

        out = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("pp"), data_spec, P()),
            out_specs=data_spec,
            check_rep=False,
        )(stage_params, micro, sep)
        return out.reshape(B, *tokens.shape[1:])


def make_pp_train_step(pp_model: PipelinedPFN, prior, criterion, cfg, tx):
    """The fused train step on a pipeline mesh: on-device prior sampling +
    pipelined forward + masked loss + backward (reverse pipeline schedule via
    AD of ppermute) + Adam — one jitted program, mirroring
    pfn_tpu.train.loop.make_train_step."""
    from pfn_tpu.train.loop import TrainState, _sample_eval_pos

    def loss_fn(params, key):
        k_data, k_sep = jax.random.split(key)
        x, y, target_y = prior.sample(k_data, cfg.batch_size, cfg.bptt)
        sep = _sample_eval_pos(k_sep, cfg)
        out = pp_model.apply(params, x, y, sep)
        losses = criterion.per_position(out, target_y)
        mask = jnp.broadcast_to(
            jnp.arange(cfg.bptt)[None, :] >= sep, losses.shape
        ).astype(losses.dtype) * criterion.valid_weight(target_y)
        return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def train_step(state: TrainState, key):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(state.params, key)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=new_params, opt_state=new_opt_state, step=state.step + 1
            ),
            {"loss": loss},
        )

    return train_step


def to_pipeline_params(params, pp_model: PipelinedPFN):
    """Convert PFNTransformer params (flat layer_{i} modules) into pipelined
    {embed, stages, decoder} params — serve/train a single-device-trained PFN
    on a pipeline mesh with bit-identical math."""
    p = params["params"]
    L = pp_model.layers_per_stage
    embed = {
        "params": {
            k: p[k] for k in ("encoder", "y_encoder", "pos_encoder") if k in p
        }
    }
    stages = []
    for s in range(pp_model.pp):
        stages.append(
            {"params": {f"layer_{i}": p[f"layer_{s * L + i}"] for i in range(L)}}
        )
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *stages)
    decoder = {"params": p["decoder"]}
    return {"embed": embed, "stages": stacked, "decoder": decoder}
