"""Mixture-of-Experts FFN with expert parallelism (Switch-style top-1).

Beyond the reference (which has a single dense FFN per layer,
transformer.py:17-23): an optional MoE replacement for the encoder FFN that
scales parameter count without scaling per-token FLOPs, sharded over an
'ep' mesh axis. Dispatch/combine are scatter-add / gather against per-token
slot indices (O(B*E*C*D) buffers — a dense one-hot dispatch tensor would be
~capacity_factor*B*T^2 floats and OOM at bptt=2010); expert weights carry a
leading (E, ...) axis sharded over 'ep', and XLA inserts the all-to-alls
from the sharding constraints — no hand-written communication.

Routing: top-1 (Switch Transformer) with capacity truncation. Tokens over
an expert's capacity fall through on the residual path (output 0 for the
FFN branch). The auxiliary load-balancing loss (mean fraction-routed x
mean router-prob per expert, scaled by E) is sown into the 'moe_aux' flax
collection; the train loop adds it to the task loss when the model routes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pfn_tpu.models.transformer import _constrain


class MoEFFN(nn.Module):
    """Drop-in FFN: (B, T, D) -> (B, T, D) through top-1-routed experts.

    Each expert is the layer's Linear(D->nhid) -> GELU -> Linear(nhid->D)
    with the second linear zero-initialized (the PFN trainability trick,
    reference transformer.py:50-51, applied per expert).
    """

    emsize: int
    nhid: int
    num_experts: int
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    # NamedSharding for the dispatched (B, E, C, D) tensor (or None): set the
    # 'ep' axis here to run experts expert-parallel.
    expert_sharding: Any = None

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        E = self.num_experts
        assert D == self.emsize, (D, self.emsize)
        C = max(1, int(self.capacity_factor * T / E))

        router = nn.Dense(
            E,
            dtype=jnp.float32,  # routing logits in f32 for stable softmax
            kernel_init=nn.initializers.normal(0.02),
            name="router",
        )(x.astype(jnp.float32))
        gates = jax.nn.softmax(router, axis=-1)  # (B, T, E)
        expert_idx = jnp.argmax(gates, axis=-1)  # (B, T)
        gate = jnp.max(gates, axis=-1)  # (B, T)

        onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)  # (B, T, E)
        # Position of each token within its expert's queue; drop past capacity.
        pos = jnp.sum(jnp.cumsum(onehot, axis=1) * onehot, axis=-1) - 1.0  # (B, T)
        keep = (pos >= 0) & (pos < C)  # (B, T)

        # Load-balancing aux loss (Switch eq. 4): E * sum_e f_e * p_e.
        frac_routed = jnp.mean(onehot, axis=(0, 1))  # (E,)
        mean_prob = jnp.mean(gates, axis=(0, 1))  # (E,)
        self.sow(
            "moe_aux", "load_balance", E * jnp.sum(frac_routed * mean_prob)
        )

        # Scatter/gather dispatch: O(B*T) index math + O(B*E*C*D) buffers —
        # no dense (B, T, E, C) one-hot (which is ~capacity_factor*B*T^2
        # floats and OOMs at bptt=2010).
        slot = expert_idx * C + jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        slot = jnp.where(keep, slot, E * C)  # dropped tokens -> overflow row
        xd = x.astype(self.dtype)

        def scatter_one(xb, sb):
            buf = jnp.zeros((E * C + 1, D), self.dtype)
            return buf.at[sb].add(xb)[:-1]  # drop the overflow row

        x_e = jax.vmap(scatter_one)(xd, slot).reshape(B, E, C, D)

        x_e = _constrain(x_e, self.expert_sharding)

        # Expert weights: stacked (E, ...) kernels applied batched over E.
        w1 = self.param(
            "w1",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (E, D, self.nhid),
        ).astype(self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (E, self.nhid)).astype(
            self.dtype
        )
        w2 = self.param(
            "w2", nn.initializers.zeros, (E, self.nhid, D)  # zero-init trick
        ).astype(self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (E, D)).astype(self.dtype)

        h = jnp.einsum("becd,edh->bech", x_e, w1) + b1[None, :, None, :]
        h = nn.gelu(h)
        y_e = jnp.einsum("bech,ehd->becd", h, w2) + b2[None, :, None, :]

        y_e = _constrain(y_e, self.expert_sharding)

        # Combine: gather each token's expert output from its slot; dropped
        # tokens contribute 0 (they ride the residual connection).
        y_flat = y_e.reshape(B, E * C, D)
        gathered = jnp.take_along_axis(
            y_flat, jnp.clip(slot, 0, E * C - 1)[..., None], axis=1
        )  # (B, T, D)
        scale = (gate * keep).astype(self.dtype)[..., None]
        return gathered * scale
