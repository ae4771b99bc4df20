"""PFN-vs-SVI-vs-MCMC comparison harness tests (SURVEY.md §2 item 19)."""

import jax
import jax.numpy as jnp
import numpy as np

from pfn_tpu.evals.comparison import (
    BayesianNNModel,
    compute_mean_and_conf_interval,
    default_model_spec,
    eval_mcmc,
    eval_svi,
    eval_transformer,
    generate_toy_data,
    training_steps_sweep,
)


def small_data(bptt=40, n=8):
    model = default_model_spec("small")
    X, y = generate_toy_data(model, bptt, n_samples=n)
    return model, X, y


def test_generate_toy_data_shapes_and_determinism():
    model, X, y = small_data()
    X2, y2 = generate_toy_data(model, 40, n_samples=8)
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X2))
    assert X.shape == (8, 40, 3) and y.shape == (8, 40)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})


def test_log_joint_finite_and_peaked_at_truth():
    model = BayesianNNModel(num_features=2, embed=3)
    key = jax.random.PRNGKey(0)
    params = model.sample_params(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (30, 2))
    y = (jax.random.uniform(jax.random.fold_in(key, 2), (30,)) > 0.5).astype(
        jnp.float32
    )
    lp = model.log_joint(params, x, y)
    assert np.isfinite(float(lp))


def test_eval_svi_beats_chance():
    model, X, y = small_data(bptt=60, n=6)
    nll, acc = eval_svi(X, y, model, training_samples_n=40, num_train_steps=300,
                        num_pred_samples=200)
    assert nll.shape == (6,) and acc.shape == (6,)
    # The BNN posterior should beat chance on its own generated data.
    assert acc.mean() > 0.55
    assert nll.mean() < 0.69  # better than log(2)


def test_eval_mcmc_matches_svi_when_converged():
    model, X, y = small_data(bptt=60, n=6)
    nll_mcmc, acc_mcmc = eval_mcmc(
        X, y, model, training_samples_n=40, warmup_steps=1000,
        num_pred_samples=400,
    )
    nll_svi, acc_svi = eval_svi(
        X, y, model, training_samples_n=40, num_train_steps=1000,
        num_pred_samples=400,
    )
    assert acc_mcmc.mean() > 0.55
    # Converged HMC should be in the same quality band as converged SVI
    # (both approximate the same BNN posterior).
    assert abs(nll_mcmc.mean() - nll_svi.mean()) < 0.2


def test_eval_transformer_runs_on_untrained_model():
    from pfn_tpu.train import TrainConfig, bce_criterion
    from pfn_tpu.train.loop import build_model
    import dataclasses

    model_bnn, X, y = small_data(bptt=40, n=8)
    prior = dataclasses.replace(model_bnn.as_prior(), num_outputs=1)
    cfg = TrainConfig(emsize=32, nhid=64, nlayers=2, nhead=4, bptt=40,
                      attention_impl="dense")
    pfn = build_model(prior, bce_criterion(), cfg)
    params = pfn.init_params(jax.random.PRNGKey(0), seq_len=40)
    acc, nll, elapsed = eval_transformer(X, y, pfn, params, training_samples_n=25)
    assert acc.shape == (8,) and nll.shape == (8,)
    assert np.isfinite(nll).all()
    assert elapsed < 60


def test_trained_pfn_approaches_svi_quality():
    """The end-to-end Fig-2 story at toy scale: a briefly-trained PFN should
    beat chance and move toward the SVI oracle."""
    import dataclasses
    from pfn_tpu.train import TrainConfig, bce_criterion, train

    model_bnn = default_model_spec("small")
    prior = dataclasses.replace(
        model_bnn.as_prior(batch_size_per_model=4), num_outputs=1
    )
    cfg = TrainConfig(
        emsize=48, nhid=96, nlayers=2, nhead=4, epochs=6, steps_per_epoch=24,
        batch_size=64, bptt=60, lr=1e-3, warmup_epochs=1,
        eval_pos_sampler="uniform", verbose=False, attention_impl="dense",
    )
    res = train(prior, bce_criterion(), cfg)

    X, y = generate_toy_data(model_bnn, 60, n_samples=16, seed=3)
    acc, nll, _ = eval_transformer(X, y, res.model, res.params, 40)
    assert acc.mean() > 0.55
    assert nll.mean() < 0.69


def test_training_steps_sweep_caches(tmp_path):
    model, X, y = small_data(bptt=30, n=3)
    res = training_steps_sweep(
        "svi", X, y, model, str(tmp_path), steps_grid=(2, 4),
        training_samples_n=20,
    )
    assert set(res.keys()) == {2, 4}
    res2 = training_steps_sweep(
        "svi", X, y, model, str(tmp_path), steps_grid=(2, 4),
        training_samples_n=20,
    )
    np.testing.assert_array_equal(res[2][0], res2[2][0])


def test_conf_interval():
    m, h = compute_mean_and_conf_interval([1.0, 2.0, 3.0, 4.0])
    assert abs(m - 2.5) < 1e-9 and h > 0
