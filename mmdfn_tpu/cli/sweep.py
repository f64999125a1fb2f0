"""Hyperparameter sweep runner — replaces ``script/run_train_ie.sh`` /
``run_train_me.sh`` (nested bash for-loops, one process per combo).

The reference grids (``run_train_ie.sh:19-52``, ``run_train_me.sh:20-52``):

  IEMOCAP: layers {16,32} x lr {1e-4,3e-4} x l2 {1e-4,2e-4} x dp {0.2,0.4}
           x gamma {0.5,1}, speaker_weights 3-0-1, --class_weight --reason_flag
  MELD:    layers {64,32,16} x lr {5e-4,1e-3} x l2 {1e-4,5e-4} x dp {0.4,0.2}
           x gamma {0.5,1}, speaker_weights 0.5-0.5-1.5, --reason_flag

Build-side improvements over the bash loops:
  * completed configs are skipped by checkpoint presence (preemption-safe
    resume for the whole sweep, SURVEY.md §5.3);
  * one process, so XLA-compiled executables are reused across combos that
    share bucket shapes (the model is tiny; compile time dominated the
    reference's per-process sweep);
  * results stream to a JSONL summary with the best combo tracked.

Usage:
  python -m mmdfn_tpu.cli.sweep --dataset IEMOCAP --data_dir .../features.pkl \
      [--epochs 30] [--out_dir outputs/sweep_ie] [--limit N]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import time

GRIDS = {
    "IEMOCAP": dict(
        Deep_GCN_nlayers=[16, 32], lr=[1e-4, 3e-4], l2=[1e-4, 2e-4],
        dropout=[0.2, 0.4], gamma=[0.5, 1.0],
        fixed=dict(speaker_weights="3-0-1", class_weight=True,
                   reason_flag=True, graph_type="GDF", valid_rate=0.0),
    ),
    "MELD": dict(
        Deep_GCN_nlayers=[64, 32, 16], lr=[5e-4, 1e-3], l2=[1e-4, 5e-4],
        dropout=[0.4, 0.2], gamma=[0.5, 1.0],
        fixed=dict(speaker_weights="0.5-0.5-1.5", class_weight=False,
                   reason_flag=True, graph_type="GDF", valid_rate=0.0),
    ),
}


def combos(dataset: str):
    grid = dict(GRIDS[dataset])
    fixed = grid.pop("fixed")
    keys = list(grid)
    for values in itertools.product(*(grid[k] for k in keys)):
        yield {**fixed, **dict(zip(keys, values))}


def combo_tag(c: dict) -> str:
    return ("L{Deep_GCN_nlayers}_lr{lr}_l2{l2}_dp{dropout}_g{gamma}"
            .format(**c))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="IEMOCAP",
                    choices=sorted(GRIDS))
    ap.add_argument("--data_dir", type=str, required=True)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32, dest="batch_size")
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--limit", type=int, default=0,
                    help="run only the first N combos (0 = all)")
    ap.add_argument("--seed", type=int, default=2021)
    ap.add_argument("--vmap", action="store_true", default=False,
                    help="train same-shape configs simultaneously via "
                         "stacked parameters (fused-kernel path: ~1.6x the "
                         "single-config step throughput on one v5e chip, "
                         "knee K=2, SWEEP_BENCH_r05.json).  lr/l2/gamma AND "
                         "dropout ride the config axis (dropout as a traced "
                         "rate, nn/drop_override.py), so each grid runs as "
                         "one group per layer count: IEMOCAP 2x16, MELD "
                         "3x16")
    ap.add_argument("--n_data_devices", type=int, default=0,
                    help="with --vmap: shard the stacked config axis over "
                         "this many devices (config parallelism; each device "
                         "trains its slice of the grid, zero collectives)")
    ap.add_argument("--tpu_fast", action="store_true", default=False,
                    help="run every combo with the measured-fastest "
                         "production kernel configuration (same preset as "
                         "run_train_erc --tpu_fast)")
    args = ap.parse_args(argv)
    out_dir = args.out_dir or f"outputs/sweep_{args.dataset.lower()}"
    os.makedirs(out_dir, exist_ok=True)

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer
    from mmdfn_tpu.cli.run_train_erc import load_dialogues

    enable_compilation_cache()

    base = ExperimentConfig(dataset=args.dataset, data_dir=args.data_dir,
                            epochs=args.epochs, batch_size=args.batch_size,
                            seed=args.seed)
    if args.tpu_fast:
        base = base.with_tpu_fast()
    train, valid, test = load_dialogues(base)

    summary_path = os.path.join(out_dir, "summary.jsonl")
    best = None
    todo = list(combos(args.dataset))
    if args.limit:
        todo = todo[: args.limit]

    if args.vmap:
        from mmdfn_tpu.train.vmap_sweep import run_grouped_sweep
        mesh = None
        if args.n_data_devices:
            from mmdfn_tpu.runtime.mesh import make_mesh
            mesh = make_mesh(n_data=args.n_data_devices)
        # per-group checkpoints under out_dir: a preempted --vmap sweep
        # resumes mid-group and skips finished groups (same contract as the
        # sequential path below)
        results = run_grouped_sweep(base, todo, train, test, verbose=True,
                                    mesh=mesh, save_dir=out_dir, resume=True)
        # mode "w", not "a": resume returns EVERY group's rows each
        # invocation (finished groups come from their 'final' markers), so
        # rewriting keeps summary.jsonl idempotent across re-runs — the
        # sequential path below appends because it skips finished combos
        with open(summary_path, "w") as f:
            for res in results:
                for k, combo in enumerate(res.combos):
                    row = dict(tag=combo_tag(combo), **combo,
                               best_epoch=res.best_epoch[k],
                               best_test_fscore=res.best_test_fscore[k],
                               best_test_acc=res.best_test_acc[k])
                    f.write(json.dumps(row) + "\n")
                    if best is None or (row["best_test_fscore"]
                                        > best["best_test_fscore"]):
                        best = row
        if best:
            print("BEST:", json.dumps(best))
        return 0
    for i, combo in enumerate(todo):
        tag = combo_tag(combo)
        save_dir = os.path.join(out_dir, tag)
        if ckpt_lib.has_checkpoint(save_dir, name="final"):
            print(f"[{i + 1}/{len(todo)}] {tag}: already complete, skipping")
            continue
        print(f"[{i + 1}/{len(todo)}] {tag}: training")
        cfg = dataclasses.replace(base, **combo)
        t0 = time.time()
        trainer = Trainer(cfg)
        # resume=True: a preempted combo continues from its 'last'
        # checkpoint instead of restarting at epoch 0
        result = trainer.fit(train, test, valid_dialogues=valid,
                             verbose=False, save_dir=save_dir, resume=True)
        row = dict(tag=tag, **combo,
                   best_epoch=result.best_epoch,
                   best_test_fscore=result.best_test_fscore,
                   best_test_acc=result.best_test_acc,
                   seconds=round(time.time() - t0, 1))
        ckpt_lib.save_checkpoint(save_dir, result.state,
                                 meta=row, name="final")
        with open(summary_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print("   ->", row)
        if best is None or row["best_test_fscore"] > best["best_test_fscore"]:
            best = row
    if best:
        print("BEST:", json.dumps(best))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
