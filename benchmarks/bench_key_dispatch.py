"""Experiment: per-step ``jax.random.fold_in`` dispatch cost over the tunnel.

bench.py and Trainer.fit derive each step's dropout key with a host-side
``jax.random.fold_in(key, i)`` — a SECOND tiny executable launch per train
step.  Over the axon tunnel every launch pays the ~1.5 ms floor, and the
op profile shows ~3.85 ms/step of device IDLE in a pipelined run.  This
measures whether pre-splitting the keys (one launch for the whole window)
closes any of that idle.

Run on TPU:  PYTHONPATH=. python benchmarks/bench_key_dispatch.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402


def main():
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    trainer = Trainer(ExperimentConfig(**PRODUCTION_CONFIG))
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)
    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)

    N = 10
    pre_keys = list(jax.random.split(key, 4 * N))
    jax.block_until_ready(pre_keys[-1])

    def run_fold(tag, w):
        t0 = time.perf_counter()
        nonlocal state
        for i in range(N):
            state, loss, _ = trainer._train_step(
                state, batches[i % 4], jax.random.fold_in(key, w * N + i))
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / N

    def run_pre(tag, w):
        t0 = time.perf_counter()
        nonlocal state
        for i in range(N):
            state, loss, _ = trainer._train_step(
                state, batches[i % 4], pre_keys[(w * N + i) % len(pre_keys)])
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / N

    # interleaved wall windows
    fold_w, pre_w = [], []
    for w in range(5):
        fold_w.append(run_fold("fold", w))
        pre_w.append(run_pre("pre", w))
    print(f"wall fold_in : best {min(fold_w) * 1e3:6.2f} ms  "
          f"windows {[round(x * 1e3, 1) for x in fold_w]}")
    print(f"wall pre-split: best {min(pre_w) * 1e3:6.2f} ms  "
          f"windows {[round(x * 1e3, 1) for x in pre_w]}")

    # traced idle comparison (shared xplane helper; cleans up its traces)
    from mmdfn_tpu.runtime.profiling import device_time_ms
    for name, fn in (("fold_in", run_fold), ("pre-split", run_pre)):
        t = device_time_ms(lambda: fn(name, 9))
        if t is None:
            print(f"trace {name:>9}: xplane tooling unavailable")
            continue
        busy, total = t[0] / N, t[1] / N
        print(f"trace {name:>9}: busy {busy:.3f} ms/step, "
              f"total {total:.3f} ms/step, idle {total - busy:.3f}")


if __name__ == "__main__":
    main()
