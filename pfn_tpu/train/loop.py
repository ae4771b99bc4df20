"""The fused pjit training loop.

Behavioral parity with reference train.py:22-135 — model construction from
criterion-dependent head width (:34-39), Adam + cosine-warmup-per-epoch
scheduler (:55-56,134), per-step eval-position sampling (:69), loss over eval
positions only (:75-92), gradient accumulation with summed gradients and
global-norm clip 1.0 every k batches (:65,93-97), per-position loss
bookkeeping (:99-108), validation hooks (:119-121).

TPU-first redesign:
  * ONE jitted step contains everything: prior sampling (on device from a
    PRNG key), eval-pos draw, forward, masked loss, grad, clip, Adam update.
    There is no host dataloader and no H2D copy per step (cf. reference
    train.py:66-71, the device boundary noted in SURVEY.md §3.1).
  * ``single_eval_pos`` is a traced scalar -> one compilation total. Loss is
    masked (positions >= sep), not sliced.
  * ``aggregate_k_gradients`` is a ``lax.scan`` over k microbatches inside
    the step, summing gradients like the reference's repeated .backward()
    (train.py:93-97 — the reference does NOT average over k; we match).
  * Data parallelism: batch sharded over the mesh 'dp' axis; params
    replicated or tensor-sharded over 'tp' (see pfn_tpu.parallel.mesh). XLA
    inserts the gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pfn_tpu.models.transformer import PFNTransformer, TransformerConfig, num_params
from pfn_tpu.parallel.mesh import (
    batch_sharding,
    expert_sharding,
    param_sharding,
    token_sharding,
)
from pfn_tpu.train.losses import Criterion
from pfn_tpu.utils.profiling import StepTimers
from pfn_tpu.utils.schedules import cosine_schedule_with_warmup, get_openai_lr


@dataclasses.dataclass
class TrainConfig:
    """Mirrors the reference train() signature (train.py:22-27)."""

    emsize: int = 200
    nhid: int = 200
    nlayers: int = 6
    nhead: int = 2
    dropout: float = 0.0
    epochs: int = 10
    steps_per_epoch: int = 100
    batch_size: int = 200
    bptt: int = 10
    lr: float | None = None
    warmup_epochs: int = 10
    input_normalization: bool = False
    aggregate_k_gradients: int = 1
    eval_pos_sampler: str = "uniform"  # 'uniform' | 'weighted' | 'fixed'
    eval_pos_max: int | None = None  # cap (<= bptt); parity: permutation_invariant_max_eval_pos
    fixed_eval_pos: int | None = None
    # Optimizer updates executed inside ONE jitted call (lax.scan over full
    # train steps). >1 amortizes host->device dispatch latency — the dominant
    # cost for small models; keep 1 when per-step host callbacks are needed.
    updates_per_call: int = 1
    # Full-state checkpoint/resume (params, opt_state, step, PRNG key, epoch)
    # every checkpoint_every epochs into checkpoint_dir; training resumes from
    # the newest checkpoint automatically. The reference only ever saved bare
    # state_dicts by hand in notebooks (SURVEY.md §5 "Checkpoint / resume").
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0
    checkpoint_keep: int = 2  # newest checkpoints retained (0 = keep all)
    validation_period: int = 10
    seed: int = 0
    verbose: bool = True
    # ZeRO-3-style parameter/optimizer-state sharding over the 'dp' mesh axis
    # (pfn_tpu.parallel.mesh.param_sharding(fsdp=True)). Only meaningful when
    # train() receives a mesh.
    fsdp: bool = False
    attention_impl: str = "auto"
    dtype: Any = jnp.float32
    # Mixture-of-Experts FFN (0 = the reference's dense FFN). The Switch
    # load-balancing aux loss is weighted into the task loss.
    num_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    encoder: Callable | None = None
    y_encoder: Callable | None = None
    pos_encoder: Callable | None = None
    decoder: Callable | None = None


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass
class TrainResult:
    final_loss: float
    positional_losses: list
    params: Any
    model: PFNTransformer
    criterion: Criterion
    config: TrainConfig
    epoch_stats: list


def build_model(
    prior, criterion: Criterion, cfg: TrainConfig, mesh=None
) -> PFNTransformer:
    n_out = criterion.n_out(prior.num_outputs)
    mcfg = TransformerConfig(
        mesh=mesh,
        token_sharding=token_sharding(mesh) if mesh is not None else None,
        num_experts=cfg.num_experts,
        moe_capacity_factor=cfg.moe_capacity_factor,
        expert_sharding=expert_sharding(mesh) if mesh is not None else None,
        num_features=prior.num_features,
        n_out=n_out,
        emsize=cfg.emsize,
        nhead=cfg.nhead,
        nhid=cfg.nhid,
        nlayers=cfg.nlayers,
        dropout=cfg.dropout,
        input_normalization=cfg.input_normalization,
        attention_impl=cfg.attention_impl,
        dtype=cfg.dtype,
        encoder=cfg.encoder,
        y_encoder=cfg.y_encoder,
        pos_encoder=cfg.pos_encoder,
        decoder=cfg.decoder,
        max_len=max(cfg.bptt * 2, 16),
    )
    return PFNTransformer(mcfg)


def _active_param_count(params, num_experts: int) -> int:
    """Dense-equivalent parameter count for the auto-LR rule: MoE expert
    weights count at 1/E (only one expert is active per token, Switch-style)
    so enabling experts does not silently depress get_openai_lr."""
    if num_experts <= 1:
        return num_params(params)
    total = 0

    def leaf(path, v):
        nonlocal total
        names = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        is_expert = "moe" in names and names.rsplit("/", 1)[-1] in (
            "w1", "w2", "b1", "b2",
        )
        total += v.size // num_experts if is_expert else v.size

    jax.tree_util.tree_map_with_path(leaf, params)
    return total


def _validate_mesh_shapes(cfg: TrainConfig, mesh) -> None:
    """Fail fast (with the reason) when the configured batch/sequence sizes
    cannot be sharded over the mesh — otherwise the per-layer constraints
    would be skipped for the B=1 init tracer but misbehave in training."""
    if mesh is None:
        return
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    tp = mesh.shape.get("tp", 1)
    ep = mesh.shape.get("ep", 1)
    assert cfg.batch_size % dp == 0, (
        f"batch_size={cfg.batch_size} must divide over dp={dp}"
    )
    if sp > 1:
        assert cfg.bptt % sp == 0, (
            f"bptt={cfg.bptt} must divide over sp={sp} for sequence "
            "parallelism (pad bptt or change sp)"
        )
    if tp > 1:
        # Without this, pfn_attention's divisibility guard would silently
        # fall back to the dense O(T^2) reference every step — the exact
        # score materialization the sharded flash path exists to avoid.
        assert cfg.nhead % tp == 0, (
            f"nhead={cfg.nhead} must divide over tp={tp} (heads are the "
            "tensor-parallel axis of attention)"
        )
    if ep > 1:
        assert cfg.num_experts % ep == 0, (
            f"num_experts={cfg.num_experts} must divide over ep={ep}"
        )


def _make_optimizer(cfg: TrainConfig, param_count: int):
    base_lr = cfg.lr if cfg.lr is not None else get_openai_lr(param_count)
    epoch_schedule = cosine_schedule_with_warmup(
        base_lr, cfg.warmup_epochs, cfg.epochs
    )
    updates_per_epoch = max(1, cfg.steps_per_epoch // cfg.aggregate_k_gradients)
    # The reference steps the scheduler once per epoch (train.py:134): the LR
    # is a function of the epoch index, constant within an epoch.
    step_schedule = lambda count: epoch_schedule(count // updates_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(step_schedule),
    )
    # Note: a raveled single-vector optimizer was measured and REJECTED — it
    # wins in isolation (3.1 -> 1.3 ms: tiny leaves tile badly alone) but
    # loses ~4% inside the fused step, where XLA overlaps the per-leaf
    # updates with other work and the ravel adds two full HBM passes.
    return tx, base_lr, step_schedule


def _sample_eval_pos(key, cfg: TrainConfig):
    if cfg.eval_pos_sampler == "fixed":
        return jnp.asarray(cfg.fixed_eval_pos, jnp.int32)
    # Resolve through the registry so user-registered samplers take effect
    # (built-ins come from pfn_tpu.utils.samplers.make_eval_pos_weights).
    from pfn_tpu.registries import EVAL_POS_SAMPLERS

    max_len = cfg.eval_pos_max or cfg.bptt
    logits = jnp.log(EVAL_POS_SAMPLERS.get(cfg.eval_pos_sampler)(max_len))
    return jax.random.categorical(key, logits).astype(jnp.int32)


def _apply_with_aux(model, cfg: TrainConfig, params, x, y, sep, k_drop):
    """Forward pass; with MoE layers, also collect the sown Switch
    load-balancing losses and return them weighted (0.0 otherwise)."""
    kwargs = dict(
        deterministic=cfg.dropout == 0.0,
        rngs={"dropout": k_drop} if cfg.dropout > 0 else None,
    )
    if cfg.attention_impl == "fused":
        # Before the MoE branch: an unsupported fused config (MoE, dropout,
        # custom modules, mesh) must raise via fused_supported, not silently
        # train the ordinary flax path.
        from pfn_tpu.models.fused_apply import fused_forward, fused_supported

        reason = fused_supported(model.config)
        if reason is not None:
            raise ValueError(
                f"fused path does not support this config: {reason}"
            )
        if jax.default_backend() not in ("tpu", "axon"):
            raise ValueError(
                "attention_impl='fused' compiles Pallas whole-layer kernels "
                "and needs a TPU backend (jit of interpreter mode is "
                "impractically slow) — use 'auto' off-TPU"
            )
        return fused_forward(model.config, params, x, y, sep), 0.0
    if cfg.num_experts > 0:
        out, mut = model.apply(params, x, y, sep, mutable=["moe_aux"], **kwargs)
        aux = sum(jnp.asarray(v).sum() for v in jax.tree.leaves(mut["moe_aux"]))
        return out, cfg.moe_aux_weight * aux
    return model.apply(params, x, y, sep, **kwargs), 0.0


def make_train_step(model, prior, criterion: Criterion, cfg: TrainConfig, tx, mesh=None):
    """Build the single fused jittable step: (state, key) -> (state, metrics)."""
    micro_batch = cfg.batch_size
    k = cfg.aggregate_k_gradients
    data_sharding = batch_sharding(mesh) if mesh is not None else None

    def microbatch_loss(params, key):
        k_data, k_sep, k_drop = jax.random.split(key, 3)
        x, y, target_y = prior.sample(k_data, micro_batch, cfg.bptt)
        if data_sharding is not None:
            # Shard the on-device-generated batch over 'dp' so every device
            # samples + trains on its own slice of datasets.
            x, y, target_y = jax.lax.with_sharding_constraint(
                (x, y, target_y), data_sharding
            )
        sep = _sample_eval_pos(k_sep, cfg)
        out, aux = _apply_with_aux(model, cfg, params, x, y, sep, k_drop)
        losses = criterion.per_position(out, target_y)  # (B, T)
        mask = jnp.broadcast_to(
            jnp.arange(cfg.bptt)[None, :] >= sep, losses.shape
        ).astype(losses.dtype) * criterion.valid_weight(target_y)
        loss = jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        # Optimize task + aux; report the TASK loss (nats) so metrics stay
        # comparable to dense runs and oracle curves.
        return loss + aux, (loss, sep)

    def train_step(state: TrainState, key):
        keys = jax.random.split(key, k)

        def micro(carry, mkey):
            grad_sum, loss_sum, pos_loss, pos_cnt = carry
            (_, (loss, sep)), grads = jax.value_and_grad(
                microbatch_loss, has_aux=True
            )(state.params, mkey)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            onehot = jax.nn.one_hot(sep, cfg.bptt)
            return (
                grad_sum,
                loss_sum + loss,
                pos_loss + onehot * loss,
                pos_cnt + onehot,
            ), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        init = (
            zero_grads,
            jnp.zeros(()),
            jnp.zeros(cfg.bptt),
            jnp.zeros(cfg.bptt),
        )
        (grads, loss_sum, pos_loss, pos_cnt), _ = jax.lax.scan(micro, init, keys)
        # Summed (not averaged) gradients over k microbatches, then clip —
        # matches reference train.py:93-97.
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss_sum / k,
            "pos_loss": pos_loss,
            "pos_cnt": pos_cnt,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_train_step_from_batch(model, criterion: Criterion, cfg: TrainConfig, tx, mesh=None):
    """Train-step variant fed by HOST-provided batches.

    For data the device cannot generate: pre-rendered caches
    (pfn_tpu.native.CachedPrior — the use_saved_from role), float64-sampled
    GP data beyond f32 on-device fidelity, or real datasets. Signature:
    ``(state, key, xs, ys, target_ys) -> (state, metrics)`` where the arrays
    carry a leading aggregate_k_gradients axis: xs (k, B, T, F), ys/targets
    (k, B, T). Everything else (masked loss, summed grads, clip, Adam,
    positional bookkeeping) matches make_train_step.
    """
    k = cfg.aggregate_k_gradients
    data_sharding = batch_sharding(mesh) if mesh is not None else None

    def microbatch_loss(params, key, x, y, target_y):
        k_sep, k_drop = jax.random.split(key)
        if data_sharding is not None:
            x, y, target_y = jax.lax.with_sharding_constraint(
                (x, y, target_y), data_sharding
            )
        sep = _sample_eval_pos(k_sep, cfg)
        out, aux = _apply_with_aux(model, cfg, params, x, y, sep, k_drop)
        losses = criterion.per_position(out, target_y)
        mask = jnp.broadcast_to(
            jnp.arange(cfg.bptt)[None, :] >= sep, losses.shape
        ).astype(losses.dtype) * criterion.valid_weight(target_y)
        loss = jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss + aux, (loss, sep)

    def train_step(state: TrainState, key, xs, ys, target_ys):
        keys = jax.random.split(key, k)

        def micro(carry, inp):
            grad_sum, loss_sum, pos_loss, pos_cnt = carry
            mkey, x, y, ty = inp
            (_, (loss, sep)), grads = jax.value_and_grad(
                microbatch_loss, has_aux=True
            )(state.params, mkey, x, y, ty)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
            onehot = jax.nn.one_hot(sep, cfg.bptt)
            return (
                grad_sum, loss_sum + loss, pos_loss + onehot * loss,
                pos_cnt + onehot,
            ), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        init = (zero_grads, jnp.zeros(()), jnp.zeros(cfg.bptt), jnp.zeros(cfg.bptt))
        (grads, loss_sum, pos_loss, pos_cnt), _ = jax.lax.scan(
            micro, init, (keys, xs, ys, target_ys)
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss_sum / k,
            "pos_loss": pos_loss,
            "pos_cnt": pos_cnt,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def make_train_chunk(train_step, updates_per_call: int):
    """Scan ``updates_per_call`` full train steps inside one jitted call.

    TPU-first: one dispatch per chunk instead of one per update removes the
    host->device round-trip from the hot loop entirely (there is no
    reference analog — the torch loop pays a Python iteration per batch,
    train.py:66). Metrics are summed over the chunk.
    """

    def chunk(state: TrainState, key):
        def body(st, sub):
            st, metrics = train_step(st, sub)
            return st, metrics

        keys = jax.random.split(key, updates_per_call)
        state, metrics = jax.lax.scan(body, state, keys)
        summed = {
            "loss": metrics["loss"].sum(),
            "pos_loss": metrics["pos_loss"].sum(0),
            "pos_cnt": metrics["pos_cnt"].sum(0),
            "grad_norm": metrics["grad_norm"].mean(),
        }
        return state, summed

    return chunk


def train(
    prior,
    criterion: Criterion,
    cfg: TrainConfig,
    mesh=None,
    init_params=None,
    validate_fn: Callable | None = None,
    data_iter=None,
) -> TrainResult:
    """Meta-train a PFN on a prior. Returns the trained params + stats.

    ``validate_fn(model, params) -> float`` is the validation hook analog of
    the reference's dl.validate (train.py:119-121).

    ``data_iter``: optional host iterator yielding ``(x, y, target_y)``
    batches of shape (batch_size, bptt, ...) — switches to the host-fed
    step (make_train_step_from_batch) for pre-rendered / out-of-fidelity
    data; ``prior`` is then only consulted for num_features/num_outputs.
    """
    model = build_model(prior, criterion, cfg, mesh=mesh)
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else model.init_params(
        init_key, seq_len=cfg.bptt
    )
    _validate_mesh_shapes(cfg, mesh)
    tx, base_lr, schedule = _make_optimizer(
        cfg, _active_param_count(params, cfg.num_experts)
    )
    if mesh is not None:
        # Place params per the tp/fsdp rules; tx.init derives the optimizer
        # state from the params eagerly, so its sharding follows automatically.
        params = jax.device_put(params, param_sharding(params, mesh, fsdp=cfg.fsdp))
    state = TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
    if data_iter is not None:
        assert cfg.updates_per_call <= 1, (
            "updates_per_call > 1 needs on-device data generation"
        )
        step_fn = make_train_step_from_batch(model, criterion, cfg, tx, mesh=mesh)
        upc = 1
    else:
        step_fn = make_train_step(model, prior, criterion, cfg, tx, mesh=mesh)
        upc = max(1, cfg.updates_per_call)
        if upc > 1:
            step_fn = make_train_chunk(step_fn, upc)
    step_jit = jax.jit(step_fn, donate_argnums=0)

    updates_per_epoch = max(1, cfg.steps_per_epoch // cfg.aggregate_k_gradients)
    assert cfg.steps_per_epoch % cfg.aggregate_k_gradients == 0, (
        "steps_per_epoch must be divisible by aggregate_k_gradients"
    )  # parity: reference train.py:65
    assert updates_per_epoch % upc == 0, (
        "updates per epoch must be divisible by updates_per_call"
    )

    start_epoch = 1
    if cfg.checkpoint_dir:
        from pfn_tpu.train.checkpoints import (
            latest_state_checkpoint,
            restore_checkpoint,
        )

        latest = latest_state_checkpoint(cfg.checkpoint_dir)
        if latest is not None:
            path, ckpt_epoch = latest
            template = {
                "state": jax.device_get(state),
                "key": jax.device_get(key),
            }
            restored = restore_checkpoint(path, template)
            # Re-apply the pre-restore placement (param/opt-state tensor
            # sharding under a tp mesh) — restore yields host arrays.
            shardings = jax.tree.map(lambda a: a.sharding, state)
            state = jax.device_put(restored["state"], shardings)
            key = jnp.asarray(restored["key"])
            start_epoch = ckpt_epoch + 1
            if cfg.verbose:
                print(f"resumed from {path} (epoch {ckpt_epoch})")

    epoch_stats = []
    timers = StepTimers()
    total_loss = float("inf")
    positional = [float("nan")] * cfg.bptt
    for epoch in range(start_epoch, cfg.epochs + 1):
        t0 = time.time()
        loss_acc = 0.0
        pos_loss_acc = jnp.zeros(cfg.bptt)
        pos_cnt_acc = jnp.zeros(cfg.bptt)
        timers.reset()
        for _ in range(updates_per_epoch // upc):
            key, sub = jax.random.split(key)
            # One fused channel: prior sampling + fwd + bwd + update are a
            # single XLA program here (the reference's three channels,
            # train.py:63-108, collapse by design — see utils/profiling.py).
            # With updates_per_call > 1 the call covers a whole scanned chunk.
            with timers.channel("fused_step"):
                if data_iter is not None:
                    ks = cfg.aggregate_k_gradients
                    batches = [next(data_iter) for _ in range(ks)]
                    xs, ys, tys = (
                        jnp.stack([b[i] for b in batches]) for i in range(3)
                    )
                    state, metrics = step_jit(state, sub, xs, ys, tys)
                else:
                    state, metrics = step_jit(state, sub)
                loss_acc += float(metrics["loss"])  # forces completion
            pos_loss_acc = pos_loss_acc + metrics["pos_loss"]
            pos_cnt_acc = pos_cnt_acc + metrics["pos_cnt"]
        total_loss = loss_acc / updates_per_epoch
        positional = (pos_loss_acc / jnp.maximum(pos_cnt_acc, 1.0)).tolist()
        val_score = None
        if validate_fn is not None and epoch % cfg.validation_period == 0:
            val_score = validate_fn(model, state.params)
        lr_now = float(schedule((epoch - 1) * updates_per_epoch))
        stats = {
            "epoch": epoch,
            "mean_loss": total_loss,
            "lr": lr_now,
            "epoch_time": time.time() - t0,
            "step_time": (timers.means().get("fused_step") or 0.0) / upc,
            "val_score": val_score,
        }
        epoch_stats.append(stats)
        if (
            cfg.checkpoint_dir
            and cfg.checkpoint_every > 0
            and epoch % cfg.checkpoint_every == 0
        ):
            from pfn_tpu.train.checkpoints import (
                prune_state_checkpoints,
                save_checkpoint,
            )

            save_checkpoint(
                f"{cfg.checkpoint_dir}/epoch_{epoch}",
                {"state": state, "key": key},
            )
            if cfg.checkpoint_keep > 0:
                prune_state_checkpoints(cfg.checkpoint_dir, cfg.checkpoint_keep)
        if cfg.verbose:
            print(
                f"| epoch {epoch:3d} | time {stats['epoch_time']:5.2f}s "
                f"| mean loss {total_loss:5.3f} | lr {lr_now:.2e}"
                + (f" | val {val_score}" if val_score is not None else "")
            )

    return TrainResult(
        final_loss=total_loss,
        positional_losses=positional,
        params=jax.device_get(state.params),
        model=model,
        criterion=criterion,
        config=cfg,
        epoch_stats=epoch_stats,
    )
