"""Few-shot image classification: stroke-prior pretraining → Omniglot transfer.

Parity: reference notebooks/FewShotOmniglot.ipynb — train a PFN on the
synthetic stroke prior (5-way episodes, bptt = 5*5+1 = 26, emsize 1024 in the
notebook), then evaluate / finetune on real Omniglot N-way-k-shot episodes
with last-position accuracy as the metric (priors/omniglot.py:74-98).

Real Omniglot requires the torchvision files on disk (no network egress);
otherwise a synthetic stroke-alphabet class bank stands in — the transfer is
then synthetic→synthetic-unseen, which exercises the identical pipeline.

Usage:
    python experiments/fewshot_omniglot.py --quick
    python experiments/fewshot_omniglot.py --omniglot_root /data/omniglot
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--n_way", type=int, default=5)
    p.add_argument("--k_shot", type=int, default=5)
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--finetune_epochs", type=int, default=None)
    p.add_argument("--omniglot_root", default="omniglot")
    p.add_argument("--out", default="results/fewshot")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from pfn_tpu.data.omniglot import (
        load_omniglot_class_bank,
        synthetic_class_bank,
    )
    from pfn_tpu.priors.omniglot import OmniglotPrior, omniglot_accuracy
    from pfn_tpu.priors.stroke import StrokePrior
    from pfn_tpu.train import TrainConfig, ce_criterion, train
    from pfn_tpu.train.loop import build_model

    imgsz = args.imgsz or (12 if args.quick else 28)
    seq_len = args.n_way * args.k_shot + 1
    n_feat = imgsz * imgsz

    # --- stage 1: pretrain on the stroke prior (ipynb cells 2-4) -----------
    stroke = StrokePrior(
        num_features=n_feat, num_outputs=args.n_way,
        only_train_for_last_idx=True,
    )
    crit = ce_criterion(args.n_way)
    if args.quick:
        cfg = TrainConfig(
            emsize=64, nhid=128, nlayers=2, nhead=4, bptt=seq_len,
            batch_size=16, epochs=args.epochs or 12, steps_per_epoch=20,
            lr=1e-3, warmup_epochs=2,
            eval_pos_sampler="fixed", fixed_eval_pos=seq_len - 1,
        )
    else:
        # FewShotOmniglot.ipynb cell 2: emsize 1024, bptt 26.
        cfg = TrainConfig(
            emsize=1024, nhid=2048, nlayers=6, nhead=8, bptt=seq_len,
            batch_size=64, epochs=args.epochs or 100, steps_per_epoch=100,
            lr=1e-4, warmup_epochs=10,
            eval_pos_sampler="fixed", fixed_eval_pos=seq_len - 1,
        )
    result = train(stroke, crit, cfg)
    print(f"stroke pretraining: final loss {result.final_loss:.4f}")

    # --- stage 2: Omniglot episodes -----------------------------------------
    try:
        bank = load_omniglot_class_bank(args.omniglot_root, imgsz=imgsz)
        train_bank, test_bank = bank.split()
        source = "omniglot"
    except FileNotFoundError:
        full = synthetic_class_bank(
            seed=7, num_classes=40, per_class=20, imgsz=imgsz
        )
        train_bank, test_bank = full.split(num_train_classes=30)
        source = "synthetic"
    print(f"episode source: {source} "
          f"({train_bank.num_classes} train / {test_bank.num_classes} test classes)")

    test_prior = OmniglotPrior(test_bank, num_outputs=args.n_way)
    acc_zero = omniglot_accuracy(
        result.model, result.params, test_prior, batch_size=32,
        seq_len=seq_len, num_batches=4,
    )
    print(f"zero-shot transfer accuracy: {acc_zero:.3f} "
          f"(chance {1 / args.n_way:.3f})")

    # --- stage 3: finetune on train-split episodes (ipynb cell 5:
    # load_weights_from_this_state_dict warm start) --------------------------
    ft_prior = OmniglotPrior(train_bank, num_outputs=args.n_way)
    ft_cfg = TrainConfig(
        **{**cfg.__dict__,
           "epochs": args.finetune_epochs or (8 if args.quick else 40),
           "lr": (cfg.lr or 1e-3) / 4, "warmup_epochs": 2},
    )
    ft = train(ft_prior, crit, ft_cfg, init_params=result.params)
    acc_ft = omniglot_accuracy(
        ft.model, ft.params, test_prior, batch_size=32, seq_len=seq_len,
        num_batches=4,
    )
    print(f"finetuned accuracy: {acc_ft:.3f}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(
            {
                "source": source,
                "n_way": args.n_way,
                "k_shot": args.k_shot,
                "zero_shot_acc": acc_zero,
                "finetuned_acc": acc_ft,
                "chance": 1 / args.n_way,
            },
            f,
            indent=2,
        )
    print(f"wrote {args.out}/summary.json")


if __name__ == "__main__":
    main()
