"""Interleaved A/B of ExperimentConfig overrides on the flagship train step.

Usage: python benchmarks/ab_config.py key=value [key=value ...]

Variant A is the production bench config; variant B applies the overrides.
Values are parsed as python literals (True/2/'bfloat16'/None).  Timing
interleaves the variants (blocked steps + pipelined windows) so shared-
tunnel drift hits both equally — protocol in `_ab_protocol.py`.
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402
from benchmarks._ab_protocol import (  # noqa: E402
    parse_overrides, run_interleaved)

BASE = PRODUCTION_CONFIG


def build(overrides):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    trainer = Trainer(ExperimentConfig(**{**BASE, **overrides}))
    return trainer, trainer.init_state()


def main():
    overrides = parse_overrides(sys.argv[1:])
    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    run_interleaved(build, [("base", {}), (str(overrides), overrides)],
                    batches, BATCH)


if __name__ == "__main__":
    main()
