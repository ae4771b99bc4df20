"""Posterior visualization (parity: presentation/heatmap_bardistribution.py;
the reference module is import-broken — :38 — so these tests are the working
spec)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pytest

from pfn_tpu.presentation import (
    heatmap_with_box_sizes,
    plot_bar_distribution,
    plot_model_and_orig_curve,
    plot_model_w_eval_pos,
)


def test_heatmap_with_box_sizes_draws_mesh():
    fig, ax = plt.subplots()
    data = np.arange(12.0).reshape(3, 4)
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    xe = np.array([1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.5, 2.0])
    ye = np.array([0.5, 2.0, 3.0])
    qm = heatmap_with_box_sizes(ax, data, xs, xe, ys, ye)
    assert qm.get_array().size == 12
    assert ax.get_xlim() == (0.0, 4.0) and ax.get_ylim() == (0.0, 3.0)
    plt.close(fig)


def test_plot_bar_distribution_sorts_and_densifies():
    fig, ax = plt.subplots()
    borders = np.array([0.0, 1.0, 3.0])  # widths 1 and 2
    x = np.array([0.7, 0.1])  # unsorted on purpose
    preds = np.array([[0.25, 0.75], [0.5, 0.5]])
    qm = plot_bar_distribution(ax, x, borders, preds)
    assert qm is not None
    plt.close(fig)


@pytest.fixture(scope="module")
def small_model():
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, bar_criterion
    from pfn_tpu.train.loop import build_model

    prior = GPPrior(num_features=1)
    crit = bar_criterion(get_bucket_limits(20, full_range=(-3.0, 3.0)))
    cfg = TrainConfig(emsize=16, nhid=32, nlayers=1, nhead=2, bptt=12)
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=12)
    return model, params, crit


def test_plot_model_w_eval_pos(small_model):
    model, params, crit = small_model
    fig, ax = plt.subplots()
    x = jnp.linspace(0, 1, 12)[:, None]
    y = jnp.sin(x[:, 0] * 6)
    qm = plot_model_w_eval_pos(ax, model, params, crit, x, y, 6)
    assert qm is not None
    plt.close(fig)


def test_plot_model_w_eval_pos_windowed(small_model):
    model, params, crit = small_model
    fig, ax = plt.subplots()
    x = jnp.linspace(0, 1, 12)[:, None]
    y = jnp.sin(x[:, 0] * 6)
    qm = plot_model_w_eval_pos(
        ax, model, params, crit, x, y, 6, min_max_y=(-1.2, 1.2)
    )
    # Windowing trims the plotted y-range to roughly min_max_y.
    assert ax.get_ylim()[0] >= -3.0 and ax.get_ylim()[1] <= 3.0
    plt.close(fig)


def test_plot_model_and_orig_curve(small_model):
    model, params, crit = small_model
    fig, ax = plt.subplots()
    x = np.linspace(0, 1, 9, dtype=np.float32)[:, None]
    y = np.sin(x[:, 0] * 5)
    qm = plot_model_and_orig_curve(ax, model, params, crit, x, y,
                                   given_indices=[1, 4, 7])
    assert qm is not None
    # Curve + context markers drawn.
    assert len(ax.lines) == 2
    plt.close(fig)
