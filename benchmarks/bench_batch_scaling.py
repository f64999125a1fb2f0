"""Throughput vs per-step batch size on the flagship train step.

The round-3 dispatch-split experiments (benchmarks/bench_dispatch_split.py)
pinned the wall-over-busy residual on a ~1.5-2 ms PER-STEP tunnel-service
floor that neither multi-step jit fusion nor dispatch batching removes.
A larger per-step batch amortizes that fixed cost over more dialogues AND
feeds the MXU bigger matmuls (the 100-wide hidden ops are far under tile
width) — the classic TPU throughput lever the reference cannot pull (its
python adjacency loop scales linearly with batch, run_train_erc.py:169-199).

Interleaves the batch sizes round-robin (blocked steps + pipelined windows)
so shared-tunnel drift hits every variant equally, then prints dps per B.

Run on TPU:  python benchmarks/bench_batch_scaling.py [B ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402

SIZES = [int(a) for a in sys.argv[1:] if a.isdigit()] or [32, 64, 128]


def main():
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    variants = []
    for B in SIZES:
        t0 = time.perf_counter()
        trainer = Trainer(ExperimentConfig(
            **{**PRODUCTION_CONFIG, "batch_size": B}))
        state = trainer.init_state()
        batches = [make_batch(rng, B, BUCKET) for _ in range(3)]
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] B={B}: {time.perf_counter() - t0:.1f}s", flush=True)
        variants.append(dict(B=B, trainer=trainer, state=state,
                             batches=batches, blocked=[], windows=[]))

    ROUNDS, STEPS = 5, 8
    for r in range(ROUNDS):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss, _ = v["trainer"]._train_step(
                v["state"], v["batches"][r % 3],
                jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        for v in variants:
            t0 = time.perf_counter()
            for i in range(STEPS):
                v["state"], loss, _ = v["trainer"]._train_step(
                    v["state"], v["batches"][i % 3],
                    jax.random.fold_in(key, 1000 + r * STEPS + i))
            jax.block_until_ready(loss)
            v["windows"].append((time.perf_counter() - t0) / STEPS)

    for v in variants:
        B = v["B"]
        bl = sorted(v["blocked"])[len(v["blocked"]) // 2]
        best = min(v["windows"])
        med = sorted(v["windows"])[len(v["windows"]) // 2]
        print(f"B={B:4d}: blocked_median={bl * 1e3:7.2f}ms "
              f"({B / bl:7.1f} dps)  best_window={best * 1e3:7.2f}ms "
              f"({B / best:8.1f} dps)  median_window={med * 1e3:7.2f}ms "
              f"({B / med:8.1f} dps)", flush=True)


if __name__ == "__main__":
    main()
