"""Regression tests for self-review findings (round 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_seqbn_with_dropout_trains():
    """input_normalization + dropout used to crash on the immutable
    batch_stats collection; SeqBN is now stateless batch-stat normalization."""
    from pfn_tpu.priors.ridge import RidgePrior
    from pfn_tpu.train import TrainConfig, mse_criterion, train

    cfg = TrainConfig(
        emsize=16, nhid=32, nlayers=1, nhead=2, epochs=1, steps_per_epoch=2,
        batch_size=4, bptt=8, lr=1e-3, warmup_epochs=1, verbose=False,
        input_normalization=True, dropout=0.1,
    )
    res = train(RidgePrior(num_features=2), mse_criterion(), cfg)
    assert jnp.isfinite(res.final_loss)


def test_seqbn_normalizes_current_batch():
    from pfn_tpu.models.transformer import SeqBN

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8)) * 5.0 + 3.0
    mod = SeqBN()
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    flat = np.asarray(out).reshape(-1, 8)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=1e-3)


def test_classbank_split_small_bank():
    from pfn_tpu.data.omniglot import synthetic_class_bank

    bank = synthetic_class_bank(seed=0, num_classes=20, per_class=4, imgsz=8)
    train_b, test_b = bank.split(num_train_classes=15)
    assert train_b.num_classes == 15 and test_b.num_classes == 5
    with pytest.raises(AssertionError):
        bank.split(num_train_classes=15, test_start=10)  # overlap
    with pytest.raises(AssertionError):
        bank.split(num_train_classes=20)  # empty test


def test_tabular_pfn_uses_context_stats(monkeypatch):
    """PFN windows are z-scored by context-prefix stats — identical
    preprocessing to the baseline path."""
    from pfn_tpu.evals import tabular as tab

    captured = {}

    class FakeModel:
        def apply(self, params, wx, wy, pos):
            captured["wx"] = np.asarray(wx)
            return jnp.zeros((*wx.shape[:2], 1))

    X = np.random.RandomState(0).randn(30, 3).astype(np.float32) * 7 + 2
    y = (np.arange(30) % 2).astype(np.float32)
    tab.evaluate_position_pfn(FakeModel(), None, X, y, bptt=20,
                              eval_position=10, max_samples=3)
    wx = captured["wx"]
    ctx = wx[:, :10]
    np.testing.assert_allclose(ctx.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(ctx.std(axis=1), 1.0, atol=1e-2)


def test_tabular_cache_key_includes_settings(tmp_path):
    from pfn_tpu.evals import tabular as tab

    X = np.random.RandomState(0).randn(40, 2).astype(np.float32)
    y = (np.arange(40) % 2).astype(np.float32)
    datasets = [["d", X, y, []]]
    metric = lambda x, yy, tx, ty, cf: (0.5, np.full(len(ty), 0.5))
    r1 = tab.evaluate(datasets, metric, "m", 20, [5], max_samples=2,
                      cache_dir=str(tmp_path))
    # Different eval position must NOT hit the first run's cache.
    r2 = tab.evaluate(datasets, metric, "m", 20, [9], max_samples=2,
                      cache_dir=str(tmp_path))
    assert "mean_metric_at_9" in r2


def test_eval_pos_registry_is_consulted():
    """Registering a custom sampler changes training draws (the registry
    used to be decorative)."""
    from pfn_tpu import registries
    from pfn_tpu.train.loop import TrainConfig, _sample_eval_pos

    registries.EVAL_POS_SAMPLERS.register(
        "always_three", lambda max_len: jnp.eye(max_len)[3] + 1e-9
    )
    try:
        cfg = TrainConfig(bptt=10, eval_pos_sampler="always_three")
        draws = {int(_sample_eval_pos(jax.random.PRNGKey(i), cfg))
                 for i in range(20)}
        assert draws == {3}
    finally:
        registries.EVAL_POS_SAMPLERS._entries.pop("always_three")


def test_full_support_sample_has_tail_mass():
    """Edge-bucket draws extend beyond the borders via the half-normal tails
    (the base class truncates to the bucket width)."""
    from pfn_tpu.distributions import (
        FullSupportBarDistribution,
        get_bucket_limits,
    )

    bar = FullSupportBarDistribution.create(
        get_bucket_limits(10, full_range=(-1.0, 1.0))
    )
    # All mass on the last bucket.
    logits = jnp.full((2000, 10), -30.0).at[:, -1].set(10.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    ys = jax.vmap(bar.sample)(keys, logits)
    assert float(ys.min()) >= float(bar.borders[-2])
    assert float(ys.max()) > float(bar.borders[-1])  # beyond the border
    # Mean of draws matches the modeled tail mean.
    np.testing.assert_allclose(
        float(ys.mean()), float(bar.mean(logits[0])), atol=0.05
    )


def test_native_cache_meta_alignment(tmp_path):
    """Metadata of non-multiple-of-4 length must not misalign records."""
    from pfn_tpu.native import BatchCacheReader, BatchCacheWriter, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    path = str(tmp_path / "odd.pfnc")
    # Shapes chosen so the JSON meta length is odd.
    shapes = {"x": (1, 3, 1), "y": (1, 3), "target_y": (1, 3)}
    data = {k: np.random.randn(*v).astype(np.float32) for k, v in shapes.items()}
    with BatchCacheWriter(path, shapes) as w:
        w.append(**data)
    r = BatchCacheReader(path)
    rec = r.record(0)
    for k in shapes:
        np.testing.assert_array_equal(rec[k], data[k])
    # Zero-copy pointer is float-aligned.
    assert rec["x"].ctypes.data % 4 == 0


# ---- round-continuation review fixes --------------------------------------

def test_bucket_limits_duplicate_ys_yield_strictly_increasing_borders():
    """Repeated y values (min-max-normalized priors emit 0/1 spikes) must not
    produce zero-width buckets (-inf log-width in the NLL)."""
    import numpy as np
    import jax.numpy as jnp
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.train import bar_criterion

    ys = np.concatenate([np.zeros(200), np.random.RandomState(0).rand(600), np.ones(200)])
    borders = np.asarray(get_bucket_limits(100, ys=ys))
    assert (np.diff(borders) > 0).all()
    crit = bar_criterion(jnp.asarray(borders))
    logits = jnp.zeros((2, 5, 100))
    targets = jnp.asarray([[0.0, 0.5, 1.0, 0.0, 1.0]] * 2)
    nll = crit.per_position(logits, targets)
    assert np.isfinite(np.asarray(nll)).all()


def test_default_group_size_divides():
    from pfn_tpu.priors.base import default_group_size

    assert default_group_size(100, 16) == 5  # 100//16=6 doesn't divide
    assert default_group_size(25, 10) == 1   # 25//10=2 doesn't divide
    assert default_group_size(64, 16) == 4
    assert default_group_size(3, 16) == 1


def test_group_priors_accept_odd_batch_sizes():
    import jax
    import numpy as np
    from pfn_tpu.priors.gp_mix import GPMixPrior
    from pfn_tpu.priors.mlp import MLPPrior

    x, y, _ = GPMixPrior(num_features=1).sample(jax.random.PRNGKey(0), 25, 6)
    assert x.shape == (25, 6, 1) and np.isfinite(np.asarray(y)).all()
    x, y, _ = MLPPrior(num_features=2).sample(jax.random.PRNGKey(0), 13, 6)
    assert x.shape == (13, 6, 2)


def test_mlp_causal_capacity_guard():
    import jax
    import pytest
    from pfn_tpu.priors.hyper import UniformInt
    from pfn_tpu.priors.mlp import MLPPrior

    bad = MLPPrior(
        num_features=64, is_causal=True,
        num_layers=UniformInt(3, 6), hidden_dim=UniformInt(16, 32),
    )  # worst case (3-2)*16 = 16 < 64
    with pytest.raises(AssertionError, match="causal mode"):
        bad.sample(jax.random.PRNGKey(0), 8, 6)


def test_batch_pred_skips_single_class_windows():
    import numpy as np
    from pfn_tpu.evals.tabular import batch_pred

    def metric_fn(x, y, tx, ty, cats):
        assert len(np.unique(ty)) >= 2, "guard failed"
        return 0.5, np.zeros(len(ty))

    wx = np.random.RandomState(0).randn(3, 10, 2).astype(np.float32)
    wy = np.stack([
        np.r_[np.zeros(5), np.r_[1, 0, 1, 0, 1]],  # mixed suffix: kept
        np.r_[np.ones(5), np.ones(5)],             # single-class suffix: skipped
        np.r_[np.ones(5), np.r_[0, 1, 0, 1, 0]],   # mixed suffix: kept
    ])
    metrics, outputs = batch_pred(metric_fn, wx, wy, [], start=5)
    assert len(metrics) == 2


def test_psd_safe_cholesky_batched_per_matrix_jitter():
    """A directly-passed batched input must only re-jitter the bad matrices,
    not converged ones (per-matrix finiteness predicate)."""
    import numpy as np
    import jax.numpy as jnp
    from pfn_tpu.ops.gp_sample import psd_safe_cholesky

    rng = np.random.RandomState(0)
    a = rng.randn(6, 4).astype(np.float32)
    good = a @ a.T + 10.0 * np.eye(6, dtype=np.float32)  # well-conditioned
    b = rng.randn(6, 2).astype(np.float32)
    bad = b @ b.T  # rank-2: needs jitter
    A = jnp.stack([good, bad])
    L = psd_safe_cholesky(A, initial_jitter=0.0)
    assert np.isfinite(np.asarray(L)).all()
    # The good matrix's factor must be the jitter-free one.
    L_good = np.linalg.cholesky(good)
    np.testing.assert_allclose(np.asarray(L[0]), L_good, rtol=1e-5, atol=1e-5)


def test_gp_sample_ard_broadcast_rules():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from pfn_tpu.ops.gp_sample import gp_sample_paths

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 10, 3))  # B=4, F=3
    # shared ARD (F,) with F != B: fine
    y = gp_sample_paths(key, x, lengthscale=jnp.ones(3), outputscale=1.0, noise=1e-2)
    assert np.isfinite(np.asarray(y)).all()
    # ambiguous: B == F
    x2 = jax.random.uniform(key, (3, 10, 3))
    with pytest.raises(ValueError, match="ambiguous"):
        gp_sample_paths(key, x2, lengthscale=jnp.ones(3), outputscale=1.0, noise=1e-2)
    # explicit (1, F) shared ARD works at B == F
    y2 = gp_sample_paths(
        key, x2, lengthscale=jnp.ones((1, 3)), outputscale=1.0, noise=1e-2
    )
    assert np.isfinite(np.asarray(y2)).all()
