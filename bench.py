"""North-star benchmark: prior-batches/sec (GP sample + train step) at
bptt=100 (BASELINE.json metric 1).

Measures the fully fused train step of the flagship GP-prior PFN (Fig-3a
architecture: emsize 512, nhead 4, nlayers 6, nhid 1024; reference
notebooks/SetupForGPFittingExperiments.ipynb cell 5) — each step generates a
fresh batch of GP datasets ON DEVICE (B x Cholesky(T x T)) and performs
forward + backward + clip + Adam.

The baseline is the reference's architecture implemented with stock PyTorch
(TransformerEncoder + additive PFN mask + host-side GP sampling via
torch.linalg.cholesky) on this host's best available torch device — the same
measurement machinery the reference prints per epoch (train.py:63-108).
Because this image has CPU-only torch, the baseline is measured once and
cached in bench_baseline.json; pass --remeasure-baseline to refresh.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import subprocess
import sys
import time


BATCH_SIZE = 64
BPTT = 100
EMSIZE, NHEAD, NHID, NLAYERS = 512, 4, 1024, 6
NUM_BUCKETS = 100
GP_HP = dict(noise=1e-4, outputscale=1.0, lengthscale=0.6)
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


FUSED_AB_FILE = os.path.join(
    os.path.dirname(__file__), "docs", "results", "fused_ab.json"
)


def _resolve_impl(attention_impl: str) -> str:
    """'best' -> the winner of the committed fused-vs-XLA A/B
    (experiments/fused_ab.py, one-process ABA on the chip), with a 5%
    threshold so noise can't flip the default; 'auto' when no A/B exists."""
    if attention_impl != "best":
        return attention_impl
    try:
        with open(FUSED_AB_FILE) as f:
            ab = json.load(f)
        return "fused" if ab.get("speedup", 0.0) > 1.05 else "auto"
    except (OSError, ValueError):
        return "auto"


def measure_pfn_tpu(steps: int = 20, warmup: int = 3, updates_per_call: int = 25,
                    grid: int = 0, attention_impl: str = "best") -> float:
    attention_impl = _resolve_impl(attention_impl)
    import jax
    import jax.numpy as jnp
    from pfn_tpu.distributions import get_bucket_limits
    from pfn_tpu.priors.gp import GPPrior
    from pfn_tpu.train import TrainConfig, bar_criterion
    from pfn_tpu.train.loop import (
        TrainState,
        _make_optimizer,
        build_model,
        make_train_chunk,
        make_train_step,
    )
    from pfn_tpu.models.transformer import num_params

    prior = GPPrior(num_features=1, grid=grid, **GP_HP)
    crit = bar_criterion(get_bucket_limits(NUM_BUCKETS, full_range=(-4.0, 4.0)))
    cfg = TrainConfig(
        emsize=EMSIZE,
        nhid=NHID,
        nlayers=NLAYERS,
        nhead=NHEAD,
        batch_size=BATCH_SIZE,
        bptt=BPTT,
        lr=1e-4,
        warmup_epochs=1,
        epochs=1,
        steps_per_epoch=steps,
        dtype=jnp.bfloat16,
        attention_impl=attention_impl,
    )
    model = build_model(prior, crit, cfg)
    params = model.init_params(jax.random.PRNGKey(0), seq_len=BPTT)
    tx, _, _ = _make_optimizer(cfg, num_params(params))
    state = TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    # Scan updates_per_call full train steps per dispatch: removes the
    # host->device round-trip from the hot loop (pfn_tpu.train.loop).
    chunk = make_train_chunk(make_train_step(model, prior, crit, cfg, tx), updates_per_call)
    step_fn = jax.jit(chunk, donate_argnums=0)

    key = jax.random.PRNGKey(1)
    for i in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    float(metrics["loss"])  # materialize: block_until_ready can no-op on
    # tunneled platforms, so force a real device->host sync
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub)
    last = float(metrics["loss"])  # sync inside the timed region; the state
    # chain (donated arg) makes every step a dependency of this value
    dt = time.perf_counter() - t0
    import math

    assert math.isfinite(last), "non-finite loss in bench"
    return steps * updates_per_call / dt


def measure_torch_baseline(steps: int = 3, warmup: int = 1) -> float:
    """Reference-style PyTorch pipeline on this host (stock torch building
    blocks, not reference source): GP sampling via torch Cholesky + a
    TransformerEncoder with the additive PFN mask + bar-NLL + Adam."""
    import math
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    B, T, D = BATCH_SIZE, BPTT, EMSIZE

    layer = nn.TransformerEncoderLayer(D, NHEAD, NHID, 0.0, activation="gelu",
                                       batch_first=True)
    encoder_stack = nn.TransformerEncoder(layer, NLAYERS)
    x_enc = nn.Linear(1, D)
    y_enc = nn.Linear(1, D)
    head = nn.Sequential(nn.Linear(D, NHID), nn.GELU(), nn.Linear(NHID, NUM_BUCKETS))
    model = nn.ModuleList([encoder_stack, x_enc, y_enc, head]).to(device)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    borders = torch.linspace(-4.0, 4.0, NUM_BUCKETS + 1, device=device)
    widths = borders[1:] - borders[:-1]

    def pfn_mask(sep):
        m = torch.zeros(T, T, device=device)
        allow = torch.zeros(T, T, dtype=torch.bool, device=device)
        allow[:, :sep] = True
        allow |= torch.eye(T, dtype=torch.bool, device=device)
        m[~allow] = float("-inf")
        return m

    def one_step():
        # on-the-fly GP sample (the reference's data hot loop, fast_gp.py:44-56)
        x = torch.rand(B, T, 1, device=device)
        d2 = torch.cdist(x, x).pow(2)
        K = GP_HP["outputscale"] * torch.exp(-0.5 * d2 / GP_HP["lengthscale"] ** 2)
        A = K + (GP_HP["noise"] + 1e-6) * torch.eye(T, device=device)
        L = torch.linalg.cholesky(A)
        y = (L @ torch.randn(B, T, 1, device=device)).squeeze(-1)

        sep = T // 2
        tok = x_enc(x)
        tok[:, :sep] += y_enc(y[:, :sep, None])
        out = encoder_stack(tok, pfn_mask(sep))
        logits = head(out[:, sep:])
        idx = (torch.searchsorted(borders, y[:, sep:].clamp(-3.999, 3.999)) - 1).clamp(0, NUM_BUCKETS - 1)
        logp = torch.log_softmax(logits, -1) - widths.log()
        loss = -logp.gather(-1, idx.unsqueeze(-1)).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        opt.zero_grad()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return steps / (time.perf_counter() - t0)


def get_baseline(remeasure: bool = False) -> float:
    if not remeasure and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["prior_batches_per_sec"]
    value = measure_torch_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {
                "prior_batches_per_sec": value,
                "what": "reference-style PyTorch (stock TransformerEncoder + "
                "torch Cholesky GP sampling + bar NLL), this host",
                "config": dict(
                    batch_size=BATCH_SIZE, bptt=BPTT, emsize=EMSIZE,
                    nhead=NHEAD, nhid=NHID, nlayers=NLAYERS,
                    sampling="exact per-batch Cholesky (no grid fast path)",
                ),
            },
            f,
            indent=2,
        )
    return value


def _measure_with_retries(args):
    """Run the TPU measurement in a child process with bounded retries.

    The axon TPU backend can be transiently UNAVAILABLE (it was at round-2
    capture time, costing the round its perf record — BENCH_r02.json rc=1).
    A failed backend init poisons the JAX process, so each attempt must be a
    fresh interpreter: we re-exec ourselves with --_measure-child, parse the
    single JSON line it prints, and back off between failures.
    """
    delays = [0, 15, 30, 60, 120, 240]
    last_err = "no attempts made"
    for attempt, delay in enumerate(delays):
        if delay:
            time.sleep(delay)
        cmd = [
            sys.executable, os.path.abspath(__file__), "--_measure-child",
            "--steps", str(args.steps), "--grid", str(args.grid),
            "--updates_per_call", str(args.updates_per_call),
            "--attention_impl", getattr(args, "attention_impl", "best"),
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=900)
        except subprocess.TimeoutExpired:
            last_err = "attempt %d: timed out after 900s (backend hang?)" % attempt
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                payload = json.loads(line)
            except ValueError:
                continue
            if "value" in payload:
                return payload["value"], None
            if "error" in payload:
                last_err = "attempt %d: %s" % (attempt, payload["error"])
                break
        else:
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            last_err = "attempt %d: rc=%d %s" % (
                attempt, proc.returncode, " | ".join(tail[-3:]))
    return None, last_err


def _measure_child(args):
    """One measurement attempt in this process; prints one JSON line."""
    try:
        value = measure_pfn_tpu(steps=args.steps, grid=args.grid,
                                updates_per_call=args.updates_per_call,
                                attention_impl=getattr(
                                    args, "attention_impl", "best"))
        print(json.dumps({"value": value}))
        return 0
    except Exception as e:  # noqa: BLE001 - reported upward as structured JSON
        print(json.dumps({"error": "%s: %s" % (type(e).__name__, str(e)[:500])}))
        return 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--grid", type=int, default=2048,
                   help="GP grid-sampling fast path size; 0 = continuous "
                        "per-dataset Cholesky sampler (~8%% slower, see "
                        "docs/PERF.md)")
    p.add_argument("--updates_per_call", type=int, default=25,
                   help="train steps fused per dispatch (lax.scan)")
    p.add_argument("--attention_impl", default="best",
                   help="'best' (winner of the committed fused A/B, else "
                        "auto) | 'auto' | 'dense' | 'flash' | 'fused' "
                        "(whole-layer Pallas kernels; TPU only)")
    p.add_argument("--remeasure-baseline", action="store_true")
    p.add_argument("--skip-baseline", action="store_true")
    p.add_argument("--_measure-child", action="store_true",
                   help=argparse.SUPPRESS)
    args = p.parse_args()

    if getattr(args, "_measure_child"):
        sys.exit(_measure_child(args))

    value, err = _measure_with_retries(args)
    if value is None:
        print(json.dumps({
            "metric": "prior-batches/sec (GP sample + train step, bptt=100)",
            "value": None,
            "unit": "batches/sec",
            "vs_baseline": None,
            "error": err,
        }))
        sys.exit(3)

    # Honest-headline companion (round-3 VERDICT item 5): when the primary
    # number rides the grid-discretized GP fast path (an algorithm swap vs
    # the exact-Cholesky torch baseline), ALSO measure the exact continuous
    # sampler (grid=0) in the same invocation, so the driver-captured record
    # separates algorithm from implementation. Non-fatal if it fails.
    value_exact, exact_err = (value, None)
    if args.grid != 0:
        import copy

        exact_args = copy.copy(args)
        exact_args.grid = 0
        value_exact, exact_err = _measure_with_retries(exact_args)

    if args.skip_baseline:
        baseline = None
    else:
        try:
            baseline = get_baseline(args.remeasure_baseline)
        except Exception:
            baseline = None
    print(
        json.dumps(
            {
                "metric": "prior-batches/sec (GP sample + train step, bptt=100)",
                "value": round(value, 3),
                "unit": "batches/sec",
                "vs_baseline": round(value / baseline, 3) if baseline else None,
                "value_exact": (round(value_exact, 3)
                                if value_exact is not None else None),
                "vs_baseline_exact": (round(value_exact / baseline, 3)
                                      if value_exact is not None and baseline
                                      else None),
                "exact_error": exact_err,
                "config": {"grid": args.grid,
                           "updates_per_call": args.updates_per_call,
                           "batch_size": BATCH_SIZE, "bptt": BPTT,
                           "value_exact_config": "grid=0 exact per-dataset "
                           "Cholesky sampler, same step otherwise"},
            }
        )
    )


if __name__ == "__main__":
    main()
