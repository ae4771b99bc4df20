"""The sklearn-style amortized-inference front-end: fit stores context,
predict is one forward; posterior summaries must be calibrated against the
training prior (quickly-trained tiny PFNs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfn_tpu import PFNClassifier, PFNRegressor
from pfn_tpu.distributions import get_bucket_limits
from pfn_tpu.priors.gp import GPPrior
from pfn_tpu.priors.mlp import MLPPrior
from pfn_tpu.train import TrainConfig, bar_criterion, bce_criterion, train


def _quick_cfg(**kw):
    base = dict(
        emsize=48,
        nhid=96,
        nlayers=2,
        nhead=4,
        epochs=30,
        steps_per_epoch=8,
        batch_size=32,
        bptt=40,
        lr=3e-3,
        warmup_epochs=2,
        verbose=False,
        attention_impl="dense",
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def gp_regressor():
    prior = GPPrior(num_features=1, noise=1e-2, outputscale=1.0, lengthscale=0.5)
    crit = bar_criterion(get_bucket_limits(64, full_range=(-4.0, 4.0)))
    result = train(prior, crit, _quick_cfg())
    return PFNRegressor.from_train_result(result), prior


def test_regressor_interpolates_context(gp_regressor):
    """Posterior mean at a context point must be close to its observed y;
    far from context it reverts toward the prior mean 0."""
    reg, prior = gp_regressor
    key = jax.random.PRNGKey(5)
    x, y, _ = prior.sample(key, 1, 30)
    X, Y = np.asarray(x[0]), np.asarray(y[0])
    reg.fit(X, Y)
    at_ctx = reg.predict(X[:5])
    np.testing.assert_allclose(at_ctx, Y[:5], atol=0.35)
    # a query far outside the x-range -> near the prior mean
    far = reg.predict(np.array([[25.0]]))
    assert abs(far[0]) < abs(Y).max()


def test_regressor_quantiles_and_std(gp_regressor):
    reg, prior = gp_regressor
    x, y, _ = prior.sample(jax.random.PRNGKey(6), 1, 30)
    reg.fit(np.asarray(x[0]), np.asarray(y[0]))
    Xq = np.linspace(0, 1, 7)[:, None].astype(np.float32)
    mean, std = reg.predict(Xq, return_std=True)
    lo, hi = reg.predict_quantiles(Xq, (0.1, 0.9))
    assert (lo < hi).all()
    assert ((lo <= mean) & (mean <= hi)).all()
    assert (std > 0).all()
    # uncertainty grows away from the context (GP behavior)
    reg.fit(np.zeros((5, 1), np.float32) + 0.5, np.zeros(5, np.float32))
    _, s_near = reg.predict(np.array([[0.5]], np.float32), return_std=True)
    _, s_far = reg.predict(np.array([[3.0]], np.float32), return_std=True)
    assert s_far[0] > s_near[0]


def test_regressor_nll_and_samples(gp_regressor):
    reg, prior = gp_regressor
    x, y, ty = prior.sample(jax.random.PRNGKey(7), 1, 36)
    X, Y = np.asarray(x[0]), np.asarray(y[0])
    reg.fit(X[:30], Y[:30])
    nll_true = reg.nll(X[30:], Y[30:])
    nll_garbage = reg.nll(X[30:], Y[30:] + 3.5)
    assert nll_true < nll_garbage
    s = reg.sample(jax.random.PRNGKey(0), X[30:], num_samples=64)
    assert s.shape == (64, 6)
    # sample mean approximates the posterior mean
    np.testing.assert_allclose(
        s.mean(axis=0), reg.predict(X[30:]), atol=0.5
    )


@pytest.fixture(scope="module")
def mlp_classifier():
    prior = MLPPrior(num_features=3, is_binary_classification=True)
    crit = bce_criterion()
    result = train(prior, crit, _quick_cfg(epochs=40))
    return PFNClassifier.from_train_result(result, normalize_x=True)


def test_classifier_separable(mlp_classifier):
    """A well-separated 2-class problem: zero-shot accuracy >= 0.8."""
    clf = mlp_classifier
    rng = np.random.RandomState(0)
    X = rng.randn(200, 3).astype(np.float32)
    margin = np.abs(X[:, 0]) > 0.5  # keep clearly-separated points
    X = X[margin][:45]
    y_raw = (X[:, 0] > 0).astype(int)
    labels = np.where(y_raw == 1, "pos", "neg")  # non-integer class labels
    clf.fit(X[:30], labels[:30])
    proba = clf.predict_proba(X[30:])
    assert proba.shape == (15, 2)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)
    pred = clf.predict(X[30:])
    acc = (pred == labels[30:]).mean()
    assert acc >= 0.8, acc


def test_feature_padding(mlp_classifier):
    """Fewer query features than the model's num_features are zero-padded +
    rescaled (the reference tabular protocol)."""
    clf = mlp_classifier
    rng = np.random.RandomState(1)
    X = rng.randn(40, 2).astype(np.float32)  # model has num_features=3
    y = (X[:, 0] > 0).astype(int)
    clf.fit(X[:30], y[:30])
    acc = (clf.predict(X[30:]) == y[30:]).mean()
    assert acc >= 0.7, acc


def test_from_checkpoint(tmp_path):
    prior = GPPrior(num_features=1, noise=1e-2)
    crit = bar_criterion(get_bucket_limits(32, full_range=(-4.0, 4.0)))
    cfg = _quick_cfg(
        epochs=2, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=1
    )
    result = train(prior, crit, cfg)
    reg = PFNRegressor.from_checkpoint(str(tmp_path / "ck"), prior, crit, cfg)
    x, y, _ = prior.sample(jax.random.PRNGKey(0), 1, 10)
    reg.fit(np.asarray(x[0, :8]), np.asarray(y[0, :8]))
    direct = PFNRegressor.from_train_result(result)
    direct.fit(np.asarray(x[0, :8]), np.asarray(y[0, :8]))
    np.testing.assert_allclose(
        reg.predict(np.asarray(x[0, 8:])),
        direct.predict(np.asarray(x[0, 8:])),
        atol=1e-5,
    )


def test_ce_proba_renormalized_over_observed_classes():
    """A 10-way CE head with only 3 classes in context must return a proper
    3-way distribution (masked-softmax renormalization)."""
    from pfn_tpu.train import ce_criterion
    from pfn_tpu.train.loop import build_model

    prior = GPPrior(num_features=2)
    crit = ce_criterion(10)
    cfg = _quick_cfg(epochs=1, steps_per_epoch=1)
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=12)
    clf = PFNClassifier(model, params, crit)
    rng = np.random.RandomState(0)
    X = rng.randn(12, 2).astype(np.float32)
    y = np.array([0, 1, 2] * 3)
    clf.fit(X[:9], y)
    proba = clf.predict_proba(X[9:])
    assert proba.shape == (3, 3)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)


def test_regressor_rejects_classifier_heads():
    import pytest

    from pfn_tpu.train import bce_criterion
    from pfn_tpu.train.loop import build_model

    prior = GPPrior(num_features=1)
    crit = bce_criterion()
    cfg = _quick_cfg(epochs=1, steps_per_epoch=1)
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=12)
    reg = PFNRegressor(model, params, crit)
    reg.fit(np.zeros((4, 1), np.float32), np.zeros(4, np.float32))
    with pytest.raises(ValueError, match="not a regression head"):
        reg.predict(np.zeros((2, 1), np.float32))
