"""Interleaved A/B of ExperimentConfig overrides on the flagship train step.

Usage: python benchmarks/ab_config.py key=value [key=value ...]

Variant A is the production bench config; variant B applies the overrides.
Values are parsed as python literals (True/2/'bfloat16'/None).  Timing
interleaves the variants (blocked steps + pipelined windows) so shared-
tunnel drift hits both equally.
"""

import ast
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402

BASE = PRODUCTION_CONFIG


def build(overrides):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    trainer = Trainer(ExperimentConfig(**{**BASE, **overrides}))
    return trainer, trainer.init_state()


def main():
    import jax

    overrides = {}
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    variants = []
    for name, ov in (("base", {}), (str(overrides), overrides)):
        t0 = time.perf_counter()
        trainer, state = build(ov)
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        variants.append(dict(name=name, trainer=trainer, state=state,
                             blocked=[], windows=[]))

    ROUNDS, STEPS = 5, 8
    for r in range(ROUNDS):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss, _ = v["trainer"]._train_step(
                v["state"], batches[r % len(batches)],
                jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        for v in variants:
            t0 = time.perf_counter()
            for i in range(STEPS):
                v["state"], loss, _ = v["trainer"]._train_step(
                    v["state"], batches[i % len(batches)],
                    jax.random.fold_in(key, 1000 + r * STEPS + i))
            jax.block_until_ready(loss)
            v["windows"].append((time.perf_counter() - t0) / STEPS)

    for v in variants:
        bl = sorted(v["blocked"])[len(v["blocked"]) // 2]
        best = min(v["windows"])
        print(f"{v['name']}: blocked_median={bl * 1e3:7.2f}ms "
              f"({BATCH / bl:7.1f} dps)  best_window={best * 1e3:7.2f}ms "
              f"({BATCH / best:7.1f} dps)  windows="
              + " ".join(f"{w * 1e3:.1f}" for w in v["windows"]), flush=True)


if __name__ == "__main__":
    main()
