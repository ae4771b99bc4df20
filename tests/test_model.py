"""PFN transformer semantics tests: mask behavior, zero-init, y-encoding
split, shapes (SURVEY.md §4 item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfn_tpu.models import PFNTransformer, TransformerConfig
from pfn_tpu.ops.attention import pfn_attention_reference, pfn_mask


def make_model(n_out=5, num_features=3, randomize=True, **kw):
    cfg = TransformerConfig(
        num_features=num_features,
        n_out=n_out,
        emsize=32,
        nhead=4,
        nhid=64,
        nlayers=2,
        attention_impl="dense",
        **kw,
    )
    model = PFNTransformer(cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=10)
    if randomize:
        # Zero-initialized residual projections make attention a no-op at
        # init; mask-semantics tests need non-degenerate weights.
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
        leaves = [
            p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
            for p, k in zip(leaves, keys)
        ]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, params


def test_output_shape_all_positions():
    model, params = make_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 10))
    out = model.apply(params, x, y, 6)
    assert out.shape == (2, 10, 5)


def test_pfn_mask_structure():
    m = np.asarray(pfn_mask(5, 3))
    expected = np.array(
        [
            [1, 1, 1, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 0, 0],
            [1, 1, 1, 1, 0],
            [1, 1, 1, 0, 1],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(m, expected)


def test_eval_points_do_not_influence_each_other():
    """Changing eval point i must not change predictions at eval point j —
    the PFN mask guarantee (reference transformer.py:35-41)."""
    model, params = make_model()
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(4), (1, 10))
    sep = 5
    out1 = model.apply(params, x, y, sep)
    x2 = x.at[0, 7].set(99.0)  # perturb eval point 7
    out2 = model.apply(params, x2, y, sep)
    # Positions != 7 unchanged (train positions and other eval positions).
    mask = np.ones(10, bool)
    mask[7] = False
    np.testing.assert_allclose(
        np.asarray(out1[0, mask]), np.asarray(out2[0, mask]), atol=1e-5
    )
    # Position 7 itself changed.
    assert np.abs(np.asarray(out1[0, 7] - out2[0, 7])).max() > 1e-4


def test_train_points_influence_everything():
    model, params = make_model()
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(6), (1, 10))
    out1 = model.apply(params, x, y, 5)
    y2 = y.at[0, 2].set(50.0)  # perturb a train label
    out2 = model.apply(params, x, y2, 5)
    diff = np.abs(np.asarray(out1 - out2)).max(axis=-1)[0]
    assert (diff > 1e-6).all()


def test_eval_labels_are_invisible():
    """y values at positions >= sep must not affect any output."""
    model, params = make_model()
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(8), (1, 10))
    out1 = model.apply(params, x, y, 5)
    y2 = y.at[0, 7:].set(1234.0)
    out2 = model.apply(params, x, y2, 5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_traced_sep_equals_static_sep():
    model, params = make_model()
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(10), (2, 10))
    f = jax.jit(lambda s: model.apply(params, x, y, s))
    out_traced = f(jnp.asarray(4))
    out_static = model.apply(params, x, y, 4)
    np.testing.assert_allclose(
        np.asarray(out_traced), np.asarray(out_static), atol=1e-5
    )


def test_zero_init_makes_layers_identity_at_init():
    """With out_proj/linear2 zero-initialized, the encoder stack at init is a
    (layer-normed) identity: outputs depend on inputs only through the token
    embedding + decoder (reference transformer.py:43-53 trick)."""
    model, params = make_model(randomize=False)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if ("out_proj" in name or "linear2" in name) and name.endswith("kernel"):
            assert float(jnp.abs(leaf).max()) == 0.0


def test_dense_attention_reference_softmax_rows():
    # Attention output for a query q < sep is a convex combination of train
    # values only.
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 6, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 6, 4))
    v = jnp.zeros((1, 1, 6, 4)).at[:, :, 3:, :].set(100.0)  # eval-value marker
    out = pfn_attention_reference(q, k, v, 3)
    # Train queries (0..2) never see eval values.
    assert float(jnp.abs(out[:, :, :3]).max()) < 1e-4
    # Eval query i sees only train values + itself (=100 marker mixes in).
    assert float(out[:, :, 3:].max()) > 1.0


def test_gaussian_head_two_outputs():
    from pfn_tpu.train.losses import gaussian_nll_criterion

    crit = gaussian_nll_criterion()
    assert crit.n_out(1) == 2
    out = jnp.stack([jnp.zeros((2, 4)), jnp.ones((2, 4))], axis=-1)
    targets = jnp.zeros((2, 4))
    losses = crit.per_position(out, targets)
    # NLL of N(0,1) at 0 = 0.5*log(2*pi).
    np.testing.assert_allclose(
        np.asarray(losses), 0.5 * np.log(2 * np.pi), rtol=1e-5
    )


@pytest.mark.parametrize("pos_kind", ["sinus", "learned"])
def test_positional_encodings_apply(pos_kind):
    from pfn_tpu.models import positional

    cls = {
        "sinus": positional.SinusoidalPositionalEncoding,
        "learned": positional.LearnedPositionalEncoding,
    }[pos_kind]
    model, params = make_model(pos_encoder=cls)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 10, 3))
    y = jax.random.normal(jax.random.PRNGKey(12), (1, 10))
    out = model.apply(params, x, y, 5)
    assert out.shape == (1, 10, 5)
