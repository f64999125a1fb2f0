"""Interleaved A/B of config overrides on the MELD flagship train step.

Usage: python benchmarks/ab_meld.py key=value [key=value ...]

Variant A is bench_meld's tpu_fast config, variant B applies the
overrides, at the MELD shapes: P=9, L<=33, 32 GCNII layers, the 864-wide
CRN party batch.  Protocol shared with ab_config.py (`_ab_protocol.py`);
written to answer "do the fused kernels pay at MELD shapes?" — the
back-to-back (non-interleaved) bench_meld runs could not resolve it
(measured answer: they win ~20%; DESIGN.md).
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")
from benchmarks._ab_protocol import (  # noqa: E402
    parse_overrides, run_interleaved)
from benchmarks.bench_meld import make_batch  # noqa: E402

B, L, NL = 32, 33, 32


def build(overrides):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    cfg = ExperimentConfig(
        dataset="MELD", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=NL, batch_size=B,
        speaker_weights="0.5-0.5-1.5", buckets=(33,)).with_tpu_fast()
    cfg = dataclasses.replace(cfg, **overrides)
    trainer = Trainer(cfg)
    return trainer, trainer.init_state()


def main():
    overrides = parse_overrides(sys.argv[1:])
    rng = np.random.default_rng(0)
    batches = [make_batch(rng, B, L) for _ in range(4)]
    run_interleaved(build, [("tpu_fast", {}), (str(overrides), overrides)],
                    batches, B, steps=12)


if __name__ == "__main__":
    main()
