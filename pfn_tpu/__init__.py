"""pfn_tpu — a TPU-native Prior-Data Fitted Network (PFN) framework.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
``automl/TransformersCanDoBayesianInference`` ("Transformers Can Do Bayesian
Inference", ICLR 2022): meta-train a transformer on synthetic datasets sampled
from a prior so that a single forward pass performs approximate Bayesian
posterior prediction on a novel dataset.

Design principles (TPU-first, not a port):
  * Priors are pure functions of a PRNG key, vmapped over the batch axis and
    fused *inside* the jitted train step — data generation never leaves the
    device (the reference generates data in a host-side torch DataLoader,
    reference train.py:66-71).
  * The PFN eval-position attention mask (reference transformer.py:35-41) is
    a scalar ``single_eval_pos`` parameter of the attention op — never a
    materialized (T, T) mask — implemented both as a fused dense-jnp op and a
    Pallas flash-attention kernel.
  * ``single_eval_pos`` is a traced scalar: losses are masked, not sliced, so
    shapes stay static and XLA compiles the train step exactly once.
  * Scaling is a ``jax.sharding.Mesh`` (data-parallel over batch = many
    independent datasets; tensor-parallel over heads/FFN) — the reference is
    single-GPU (reference train.py:29).
"""

__version__ = "0.1.0"

from pfn_tpu import distributions, models, ops, parallel, priors, train, utils
from pfn_tpu import bayesopt, config, data, evals, inference, presentation, registries
from pfn_tpu.inference import PFNClassifier, PFNRegressor

__all__ = [
    "PFNClassifier",
    "PFNRegressor",
    "inference",
    "bayesopt",
    "config",
    "data",
    "distributions",
    "models",
    "ops",
    "parallel",
    "presentation",
    "priors",
    "registries",
    "train",
    "evals",
    "utils",
]
