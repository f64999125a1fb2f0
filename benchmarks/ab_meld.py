"""Interleaved A/B of config overrides on the MELD flagship train step.

Usage: python benchmarks/ab_meld.py key=value [key=value ...]

Same protocol as ab_config.py (variant A = bench_meld's tpu_fast config,
variant B applies the overrides; blocked steps + pipelined windows
interleaved so shared-tunnel drift hits both equally) but at the MELD
shapes: P=9, L<=33, 32 GCNII layers, the 864-wide CRN party batch.
Written to answer "do the fused kernels pay at MELD shapes?" — the
back-to-back (non-interleaved) bench_meld runs could not resolve it.
"""

import ast
import sys
import time

import numpy as np

sys.path.insert(0, ".")
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
    import dataclasses
    cfg = dataclasses.replace(cfg, **overrides)
    trainer = Trainer(cfg)
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
    batches = [make_batch(rng, B, L) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    variants = []
    for name, ov in (("tpu_fast", {}), (str(overrides), overrides)):
        t0 = time.perf_counter()
        trainer, state = build(ov)
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        variants.append(dict(name=name, trainer=trainer, state=state,
                             blocked=[], windows=[]))

    ROUNDS, STEPS = 5, 12
    for r in range(ROUNDS):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss, _ = v["trainer"]._train_step(
                v["state"], batches[r % 4], jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        for v in variants:
            t0 = time.perf_counter()
            for i in range(STEPS):
                v["state"], loss, _ = v["trainer"]._train_step(
                    v["state"], batches[i % 4],
                    jax.random.fold_in(key, 1000 + r * STEPS + i))
            jax.block_until_ready(loss)
            v["windows"].append((time.perf_counter() - t0) / STEPS)

    for v in variants:
        bl = sorted(v["blocked"])[len(v["blocked"]) // 2]
        best, med = min(v["windows"]), sorted(v["windows"])[2]
        print(f"{v['name']}: blocked_median={bl * 1e3:7.2f}ms  "
              f"best_window={best * 1e3:6.2f}ms ({B / best:7.1f} dps)  "
              f"median_window={med * 1e3:6.2f}ms ({B / med:7.1f} dps)",
              flush=True)


if __name__ == "__main__":
    main()
