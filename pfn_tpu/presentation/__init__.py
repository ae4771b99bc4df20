"""Posterior visualization helpers."""

from pfn_tpu.presentation.heatmap import (
    heatmap_with_box_sizes,
    plot_bar_distribution,
    plot_model_w_eval_pos,
    plot_model_and_orig_curve,
)

__all__ = [
    "heatmap_with_box_sizes",
    "plot_bar_distribution",
    "plot_model_w_eval_pos",
    "plot_model_and_orig_curve",
]
