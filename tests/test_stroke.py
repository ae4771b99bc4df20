"""Stroke prior (parity: reference priors/stroke.py)."""

import jax
import jax.numpy as jnp
import pytest

from pfn_tpu.priors.stroke import StrokePrior


@pytest.fixture(scope="module")
def batch():
    prior = StrokePrior(num_features=100, num_outputs=2)
    x, y, t = jax.jit(lambda k: prior.sample(k, 8, 11))(jax.random.PRNGKey(0))
    return prior, x, y, t


def test_shapes_and_ranges(batch):
    prior, x, y, t = batch
    assert x.shape == (8, 11, 100)
    assert y.shape == (8, 11) and t.shape == (8, 11)
    # Pixels in [0, ~1] like ToTensor() on a uint8 render (stroke.py:107).
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.01
    # Strokes cover some but not all of the canvas.
    nz = float((x > 0).mean())
    assert 0.02 < nz < 0.9


def test_labels_are_classes(batch):
    prior, x, y, t = batch
    assert set(jnp.unique(y).tolist()) <= {0.0, 1.0}
    assert jnp.array_equal(y, t)  # targets == labels without last-idx mode


def test_same_class_images_differ_but_share_structure():
    """Two renders of one class differ (jitter) yet images from the same
    class within a batch element correlate more than across classes."""
    prior = StrokePrior(num_features=400, num_outputs=2)
    x, y, _ = jax.jit(lambda k: prior.sample(k, 4, 40))(jax.random.PRNGKey(3))
    for b in range(4):
        cls0 = x[b][y[b] == 0]
        cls1 = x[b][y[b] == 1]
        if len(cls0) < 2 or len(cls1) < 2:
            continue
        assert not jnp.allclose(cls0[0], cls0[1])  # render jitter

    # Mean same-class pixel correlation exceeds cross-class correlation on
    # average over the batch (stroke programs are class-specific).
    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-9))

    same, cross = [], []
    for b in range(4):
        cls0 = x[b][y[b] == 0]
        cls1 = x[b][y[b] == 1]
        if len(cls0) >= 2:
            same.append(corr(cls0[0], cls0[1]))
        if len(cls0) >= 1 and len(cls1) >= 1:
            cross.append(corr(cls0[0], cls1[0]))
    assert sum(same) / len(same) > sum(cross) / len(cross)


def test_only_train_for_last_idx():
    """Balanced support set + single query; targets -100 except last
    (stroke.py:97-103)."""
    prior = StrokePrior(num_features=100, num_outputs=2, only_train_for_last_idx=True)
    x, y, t = jax.jit(lambda k: prior.sample(k, 6, 11))(jax.random.PRNGKey(1))
    # Support labels are balanced: 5 of each class in the first 10.
    support = y[:, :-1]
    assert jnp.all(support.sum(axis=1) == 5)
    assert jnp.all(t[:, :-1] == -100)
    assert jnp.all(t[:, -1] == y[:, -1])


def test_seq_len_constraint():
    prior = StrokePrior(num_features=100, num_outputs=2, only_train_for_last_idx=True)
    with pytest.raises(AssertionError):
        prior.sample(jax.random.PRNGKey(0), 2, 12)  # (12-1) % 2 != 0


def test_num_features_must_be_square():
    with pytest.raises(AssertionError):
        StrokePrior(num_features=99).sample(jax.random.PRNGKey(0), 1, 3)


def test_normalize_x():
    prior = StrokePrior(num_features=100, num_outputs=2, normalize_x=True)
    x, _, _ = jax.jit(lambda k: prior.sample(k, 2, 5))(jax.random.PRNGKey(2))
    means = x.mean(axis=-1)
    assert float(jnp.abs(means).max()) < 1e-4


def test_registry_entry():
    from pfn_tpu.registries import PRIORS

    assert PRIORS.get("stroke") is StrokePrior
