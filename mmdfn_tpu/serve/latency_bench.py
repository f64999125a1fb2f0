"""Streaming latency benchmark: captures p50/p90/p99 as a JSON artifact.

BASELINE.json names "p50 utterance latency" the headline serving metric for
the streaming stretch config.  This module makes that number reproducible:
it builds the flagship MM-DFN configuration (IEMOCAP GDF, 16 GCNII layers —
the same model ``bench.py`` trains), feeds synthetic dialogues through
``serve.streaming.measure_latency`` utterance-by-utterance, and writes the
percentile summary to a committed JSON file (``LATENCY_r{N}.json``).

Latency is a property of the serving path (buffer update + prefix forward +
one device round-trip), not of the trained weights, so freshly initialized
parameters measure the same thing a checkpoint would — no checkpoint needed
to reproduce the artifact.  Pass ``--load_model`` to measure a real one.

Run as a module:
    python -m mmdfn_tpu.serve.latency_bench --out LATENCY_r02.json
"""

from __future__ import annotations

import argparse
import json
import sys


def run(cfg=None, n_dialogues: int = 6, min_len: int = 20, max_len: int = 60,
        buckets=(8, 16, 32, 64, 128, 200), seed: int = 0,
        load_model: str | None = None):
    """Measure per-utterance streaming latency; returns the summary dict."""
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.serve.streaming import measure_latency
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    if cfg is None:
        cfg = ExperimentConfig(
            dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
            class_weight=True, Deep_GCN_nlayers=16, speaker_weights="3-0-1",
            batch_size=8)

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/iemocap_synth.pkl"
        make_synthetic_iemocap_pickle(path, n_train=1, n_test=n_dialogues,
                                      min_len=min_len, max_len=max_len,
                                      seed=seed)
        dialogues = IEMOCAPDataset(path, train=False).dialogues()

    trainer = Trainer(cfg)
    state = trainer.init_state()
    if load_model is not None:
        state, _ = ckpt_lib.restore_checkpoint(load_model, state)

    summary = measure_latency(trainer, state, dialogues, buckets=buckets,
                              warmup_dialogues=1)
    summary.update(
        model=f"MM-DFN {cfg.graph_type} {cfg.Deep_GCN_nlayers}L "
              f"({cfg.dataset})",
        platform=jax.devices()[0].platform,
        buckets=list(buckets), n_dialogues=n_dialogues,
        dialogue_len=[min_len, max_len])
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", type=str, default=None,
                    help="write the JSON summary to this path")
    ap.add_argument("--n_dialogues", type=int, default=6)
    ap.add_argument("--min_len", type=int, default=20)
    ap.add_argument("--max_len", type=int, default=60)
    ap.add_argument("--buckets", type=str, default="8,16,32,64,128,200")
    ap.add_argument("--nlayers", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--load_model", type=str, default=None,
                    help="optional checkpoint dir; default measures with "
                         "fresh params (latency is weight-independent)")
    ap.add_argument("--tpu_fast", action="store_true",
                    help="serve with the production perf knobs (fused "
                         "pallas kernels etc.; math equivalent up to bf16 "
                         "rounding — see ExperimentConfig.TPU_FAST_KNOBS)")
    args = ap.parse_args(argv)

    from mmdfn_tpu.config import ExperimentConfig
    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=args.nlayers,
        speaker_weights="3-0-1", batch_size=8)
    if args.tpu_fast:
        cfg = cfg.with_tpu_fast()
    summary = run(cfg=cfg, n_dialogues=args.n_dialogues,
                  min_len=args.min_len, max_len=args.max_len,
                  buckets=tuple(int(b) for b in args.buckets.split(",")),
                  seed=args.seed, load_model=args.load_model)
    summary["config"] = "tpu_fast" if args.tpu_fast else "parity-default"
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
