"""In-loop validation hook (parity: reference fast_gp_mix.py:139-153 +
train.py:119-121)."""

import jax

from pfn_tpu.distributions import get_bucket_limits
from pfn_tpu.evals import make_mean_mse_validator
from pfn_tpu.priors.gp_mix import GPMixPrior
from pfn_tpu.train import TrainConfig, bar_criterion, train


def test_validator_runs_and_improves_with_training():
    prior = GPMixPrior(num_features=1, batch_size_per_gp_sample=4)
    crit = bar_criterion(get_bucket_limits(30, full_range=(-6.0, 6.0)))
    validator = make_mean_mse_validator(prior, crit, batch_size=16, seq_len=20)

    cfg = TrainConfig(
        emsize=32, nhid=64, nlayers=2, nhead=2, epochs=4, steps_per_epoch=10,
        batch_size=16, bptt=20, lr=3e-3, warmup_epochs=1, verbose=False,
        validation_period=2,
    )
    res = train(prior, crit, cfg, validate_fn=validator)
    # Hook ran at epochs 2 and 4 (validation_period=2).
    scores = [s["val_score"] for s in res.epoch_stats]
    assert scores[0] is None and scores[1] is not None
    assert scores[3] is not None and scores[3] > 0

    # Untrained model should be worse than the trained one.
    model = res.model
    untrained = model.init_params(jax.random.PRNGKey(9), seq_len=20)
    assert validator(model, res.params) <= validator(model, untrained) * 1.5
