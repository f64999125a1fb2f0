"""Streaming serving CLI: per-utterance emotion predictions over stdio.

Loads a trained checkpoint and serves one dialogue at a time: each stdin
line is a JSON utterance ``{"text": [...], "audio": [...], "visual": [...],
"speaker": int}`` (feature vectors in the dataset's dims); the response line
is ``{"pred": int, "label": str, "log_probs": [...], "latency_ms": float}``.
A line ``{"reset": true}`` starts a new dialogue.  ``--warmup`` pre-compiles
every bucket before reading input so first-utterance latency is pure
compute.

The model configuration (dataset, graph type, layer count, ...) is
reconstructed from the checkpoint's stored training config.

Example:
  python -m mmdfn_tpu.cli.serve --load_model outputs/iemocap_demo \
      < utterances.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--load_model", type=str, required=True)
    ap.add_argument("--buckets", type=str, default="8,16,32,64,128,200")
    ap.add_argument("--warmup", action="store_true", default=True)
    ap.add_argument("--no-warmup", dest="warmup", action="store_false")
    args = ap.parse_args(argv)

    import dataclasses

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.serve import StreamingSession
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    if not ckpt_lib.has_checkpoint(args.load_model):
        print(f"no checkpoint under {args.load_model!r}", file=sys.stderr)
        return 1
    # the model config is the one the checkpoint was TRAINED with — stored
    # in its meta.json by Trainer.fit; rebuilding it from CLI flags would
    # silently mis-serve (wrong speaker weights) or crash on param-structure
    # mismatches (reason_flag, base_model, ...)
    meta = ckpt_lib.read_meta(args.load_model)
    saved = meta.get("config")
    if not saved:
        print("checkpoint has no config metadata; cannot reconstruct the "
              "training configuration", file=sys.stderr)
        return 1
    fields = {f.name for f in dataclasses.fields(ExperimentConfig)}
    saved = {k: (tuple(v) if isinstance(v, list) else v)
             for k, v in saved.items() if k in fields}
    cfg = ExperimentConfig(**saved)
    trainer = Trainer(cfg)
    state, _ = ckpt_lib.restore_checkpoint(args.load_model,
                                           trainer.init_state())
    names = cfg.info["target_names"]
    buckets = tuple(int(b) for b in args.buckets.split(","))
    session = StreamingSession(trainer, state, buckets=buckets)
    if args.warmup:
        t0 = time.perf_counter()
        session.warmup()
        print(json.dumps({"ready": True, "warmup_s":
                          round(time.perf_counter() - t0, 2),
                          "ckpt_epoch": meta.get("epoch")}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        # per-request isolation: a malformed line, an out-of-range speaker,
        # or a dialogue overflowing the largest bucket must produce an error
        # response, not kill the server
        try:
            msg = json.loads(line)
            if msg.get("reset"):
                session.reset()
                print(json.dumps({"reset": True}), flush=True)
                continue
            t0 = time.perf_counter()
            pred, logp = session.append(
                np.asarray(msg["text"], np.float32),
                np.asarray(msg["audio"], np.float32),
                np.asarray(msg["visual"], np.float32),
                int(msg.get("speaker", 0)))
            print(json.dumps({
                "pred": pred, "label": names[pred],
                "log_probs": [round(float(v), 4) for v in logp],
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2)}),
                flush=True)
        except Exception as e:                       # noqa: BLE001
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
