"""Bar-distribution heatmaps: visualize the PFN posterior p(y | x, D).

Parity: reference presentation/heatmap_bardistribution.py — variable-size-box
heatmap (:21-35), ``plot_bar_distribution`` (:41-60), posterior-vs-truth
visualizers ``plot_model_w_eval_pos`` / ``plot_model_and_orig_curve``
(:63-95). Two deliberate deviations: (1) the reference module crashes on
import due to a stray module-level ``print(ax.get_ylim())`` (:38) — not
replicated; (2) the reference draws one Rectangle patch per cell in a Python
double loop ("it is normal to be slow", :7) — here the boxes are contiguous
in both axes, so everything is a single vectorized ``pcolormesh``.
"""

from __future__ import annotations

import numpy as np


def _default_cmap():
    try:
        import seaborn as sns

        return sns.color_palette("rocket", as_cmap=True)
    except Exception:
        import matplotlib.pyplot as plt

        return plt.get_cmap("magma")


def heatmap_with_box_sizes(
    ax, data, x_starts, x_ends, y_starts, y_ends, palette=None, set_lims=True
):
    """Heatmap with per-column x-extents and per-row y-extents.

    data: (num_rows, num_cols); all start/end arrays sorted ascending and
    contiguous (``x_ends[i] == x_starts[i+1]``) — true for bar-distribution
    plots by construction. Parity: heatmap_with_box_sizes (:21-35) minus the
    per-cell Rectangle loop.
    """
    data = np.asarray(data, dtype=np.float64)
    x_starts = np.asarray(x_starts)
    x_ends = np.asarray(x_ends)
    y_starts = np.asarray(y_starts)
    y_ends = np.asarray(y_ends)
    if palette is None:
        palette = _default_cmap()
    if set_lims:
        ax.set_xlim(float(x_starts[0]), float(x_ends[-1]))
        ax.set_ylim(float(y_starts[0]), float(y_ends[-1]))
    data = (data - data.min()) / (data.max() - data.min() + 1e-12)
    x_edges = np.concatenate([x_starts, x_ends[-1:]])
    y_edges = np.concatenate([y_starts, y_ends[-1:]])
    return ax.pcolormesh(x_edges, y_edges, data, cmap=palette, shading="flat")


def plot_bar_distribution(ax, x, bar_borders, predictions, **kwargs):
    """Plot per-query bucket probabilities as densities over (x, y).

    x: (T,) or (T, 1[, 1]) query inputs; predictions: (T, num_bars)
    probabilities (pass softmaxed logits); bar_borders: (num_bars + 1,).
    Parity: plot_bar_distribution (:41-60) — sort by x, divide by bucket
    widths (probability -> density), x-boxes span midpoints between
    consecutive sorted xs.
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    predictions = np.asarray(predictions, dtype=np.float64)
    predictions = predictions.reshape(len(x), -1)
    bar_borders = np.asarray(bar_borders, dtype=np.float64)
    assert len(bar_borders) - 1 == predictions.shape[1]

    order = np.argsort(x)
    x = x[order]
    widths = bar_borders[1:] - bar_borders[:-1]
    density = predictions[order] / widths

    mids = (x[1:] + x[:-1]) / 2
    x_starts = np.concatenate([x[:1], mids])
    x_ends = np.concatenate([mids, x[-1:]])
    return heatmap_with_box_sizes(
        ax, density.T, x_starts, x_ends, bar_borders[:-1], bar_borders[1:],
        **kwargs,
    )


def plot_model_w_eval_pos(
    ax, model, params, criterion, x, y, single_eval_pos, min_max_y=None,
    **kwargs,
):
    """Forward the PFN and heatmap the posterior at eval positions.

    x: (T, F) or (1, T, F); y: (T,) or (1, T). Parity:
    plot_model_w_eval_pos (:63-76) incl. the min_max_y bucket windowing.
    """
    import jax.numpy as jnp
    import jax

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 2:
        x = x[None]
    if y.ndim == 1:
        y = y[None]
    logits = model.apply(params, x, y, single_eval_pos)[0, single_eval_pos:]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    borders = np.asarray(criterion.bar.borders, dtype=np.float64)
    if min_max_y is not None:
        lo = int(np.searchsorted(borders, min_max_y[0]))
        hi = min(int(np.searchsorted(borders, min_max_y[1])), len(borders))
        probs = probs[..., lo : hi - 1]
        borders = borders[lo:hi]
    return plot_bar_distribution(
        ax, np.asarray(x)[0, single_eval_pos:, 0], borders, probs, **kwargs
    )


def plot_model_and_orig_curve(
    ax, model, params, criterion, x, y, given_indices=(0,)
):
    """Ground-truth curve + context points + posterior heatmap everywhere.

    x: (T, 1) dense curve inputs, y: (T,). ``given_indices`` are the context
    points shown to the model; the posterior is plotted over ALL of x.
    Parity: plot_model_and_orig_curve (:79-95).
    """
    import numpy as _np

    x = _np.asarray(x, dtype=_np.float32).reshape(-1, 1)
    y = _np.asarray(y, dtype=_np.float32).reshape(-1)
    gi = list(given_indices)
    x_winput = _np.concatenate([x[gi], x], axis=0)
    y_winput = _np.concatenate([y[gi], y], axis=0)

    ax.plot(x[:, 0], y, color="grey")
    ax.plot(x[gi, 0], y[gi], "o", color="black")
    try:
        import seaborn as sns

        palette = sns.cubehelix_palette(
            start=2, rot=0, dark=0.4, light=1, as_cmap=True
        )
    except Exception:
        import matplotlib.pyplot as plt

        palette = plt.get_cmap("Blues")
    return plot_model_w_eval_pos(
        ax, model, params, criterion, x_winput, y_winput, len(gi),
        min_max_y=(float(y.min()) - 0.3, float(y.max()) + 0.3),
        palette=palette,
    )
