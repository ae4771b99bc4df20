"""Checkpoint round-trip and torch golden-parity tests (SURVEY.md §7 "Hard
parts": numerical parity with PyTorch checkpoints needs a torch->jax
converter plus parity tests on fixed inputs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfn_tpu.models import PFNTransformer, TransformerConfig
from pfn_tpu.train.checkpoints import (
    export_torch_state_dict,
    import_torch_state_dict,
    restore_checkpoint,
    save_checkpoint,
)

EMSIZE, NHEAD, NHID, NLAYERS, NOUT, F = 32, 4, 64, 2, 5, 3


def build_model():
    cfg = TransformerConfig(
        num_features=F,
        n_out=NOUT,
        emsize=EMSIZE,
        nhead=NHEAD,
        nhid=NHID,
        nlayers=NLAYERS,
        attention_impl="dense",
    )
    model = PFNTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=12)
    return model, params


def build_torch_twin():
    """A torch model with the reference's architecture (stock torch modules,
    post-LN GELU TransformerEncoder, Linear encoders, MLP decoder) — the
    golden oracle for forward parity."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            layer = nn.TransformerEncoderLayer(
                EMSIZE, NHEAD, NHID, 0.0, activation="gelu"
            )
            self.transformer_encoder = nn.TransformerEncoder(layer, NLAYERS)
            self.encoder = nn.Linear(F, EMSIZE)
            self.y_encoder = nn.Linear(1, EMSIZE)
            self.decoder = nn.Sequential(
                nn.Linear(EMSIZE, NHID), nn.GELU(), nn.Linear(NHID, NOUT)
            )

        def forward(self, x_seqfirst, y_seqfirst, sep):
            # PFN forward semantics (reference transformer.py:55-91):
            # train tokens = enc(x)+y_enc(y), eval tokens = enc(x); additive
            # mask allowing keys {j < sep} | {j == i}.
            T = x_seqfirst.shape[0]
            xe = self.encoder(x_seqfirst)
            ye = self.y_encoder(y_seqfirst.unsqueeze(-1))
            src = torch.cat([xe[:sep] + ye[:sep], xe[sep:]], 0)
            allow = torch.zeros(T, T, dtype=torch.bool)
            allow[:, :sep] = True
            allow |= torch.eye(T, dtype=torch.bool)
            mask = torch.zeros(T, T).masked_fill(~allow, float("-inf"))
            out = self.transformer_encoder(src, mask)
            return self.decoder(out)

    return Twin()


def test_torch_import_forward_parity():
    torch = pytest.importorskip("torch")
    twin = build_torch_twin()
    model, _ = build_model()
    params = import_torch_state_dict(twin.state_dict(), NLAYERS)

    rng = np.random.RandomState(7)
    x = rng.randn(12, 2, F).astype(np.float32)  # (T, B, F) torch layout
    y = rng.randn(12, 2).astype(np.float32)
    sep = 7
    with torch.no_grad():
        ref = twin(torch.from_numpy(x), torch.from_numpy(y), sep).numpy()
    # Ours is batch-first.
    out = model.apply(
        params, jnp.asarray(x.transpose(1, 0, 2)), jnp.asarray(y.T), sep
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(1, 0, 2), ref, atol=2e-4, rtol=2e-4
    )


def test_torch_export_roundtrip():
    pytest.importorskip("torch")
    model, params = build_model()
    sd = export_torch_state_dict(params, NLAYERS)
    params2 = import_torch_state_dict(sd, NLAYERS)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_orbax_roundtrip(tmp_path):
    model, params = build_model()
    state = {"params": params, "step": jnp.asarray(17)}
    save_checkpoint(str(tmp_path / "ckpt"), state)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template=state)
    assert int(restored["step"]) == 17
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_through_train():
    """load_weights_from_this_state_dict parity (reference train.py:46-47):
    train() accepts init_params."""
    from pfn_tpu.priors.ridge import RidgePrior
    from pfn_tpu.train import TrainConfig, gaussian_nll_criterion, train

    prior = RidgePrior(num_features=1)
    cfg = TrainConfig(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=1, steps_per_epoch=2,
        batch_size=8, bptt=8, lr=1e-3, warmup_epochs=1, verbose=False,
        attention_impl="dense",
    )
    r1 = train(prior, gaussian_nll_criterion(), cfg)
    r2 = train(prior, gaussian_nll_criterion(), cfg, init_params=r1.params)
    assert np.isfinite(r2.final_loss)
