"""Evaluation: exact-posterior oracles and the PFN evaluation harnesses."""

from pfn_tpu.evals.oracles import (
    gp_exact_evaluate,
    gp_exact_posterior_moments,
    ridge_evaluate,
    bayes_linreg_posterior,
)
from pfn_tpu.evals.harness import (
    eval_positional_loss,
    eval_positional_loss_per_dataset,
    eval_positional_logits_per_dataset,
    make_mean_mse_validator,
    pfn_predict,
)
from pfn_tpu.evals import comparison, gp_mix_oracles, inference, tabular

__all__ = [
    "gp_exact_evaluate",
    "gp_exact_posterior_moments",
    "ridge_evaluate",
    "bayes_linreg_posterior",
    "eval_positional_loss",
    "eval_positional_loss_per_dataset",
    "eval_positional_logits_per_dataset",
    "make_mean_mse_validator",
    "pfn_predict",
    "comparison",
    "gp_mix_oracles",
    "inference",
    "tabular",
]
