"""Experiment: split the wall-over-busy gap into host-dispatch vs wait.

Best pipelined wall is ~8.4 ms/step while the device is ~4.9 ms busy and
<0.3 ms idle in a clean trace.  Where do the other ~3.5 ms go?  Times the
dispatch-only phase (enqueue N steps, no blocking) separately from the
drain (block_until_ready), and repeats with a host-side sleep injected
after dispatch to see whether the device finishes the queue while the
host naps (queue depth real) or the wall stretches (dispatch serialized
with execution).

Run on TPU:  PYTHONPATH=. python benchmarks/bench_dispatch_split.py
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
    keys = list(jax.random.split(key, 64))
    jax.block_until_ready(keys[-1])

    N = 12
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(N):
            state, loss, _ = trainer._train_step(
                state, batches[i % 4], keys[(rep * N + i) % 64])
        t1 = time.perf_counter()
        jax.block_until_ready(loss)
        t2 = time.perf_counter()
        print(f"rep{rep}: dispatch {1e3 * (t1 - t0) / N:6.2f} ms/step, "
              f"drain {1e3 * (t2 - t1):7.2f} ms total, "
              f"wall {1e3 * (t2 - t0) / N:6.2f} ms/step")

    # nap test: if the device chews the queue during a host sleep, the
    # drain after the nap should be ~zero
    for nap in (0.05, 0.1):
        t0 = time.perf_counter()
        for i in range(N):
            state, loss, _ = trainer._train_step(
                state, batches[i % 4], keys[i % 64])
        t1 = time.perf_counter()
        time.sleep(nap)
        t2 = time.perf_counter()
        jax.block_until_ready(loss)
        t3 = time.perf_counter()
        print(f"nap {nap * 1e3:.0f}ms: dispatch {1e3 * (t1 - t0) / N:6.2f} "
              f"ms/step, post-nap drain {1e3 * (t3 - t2):7.2f} ms, "
              f"wall-minus-nap {1e3 * (t3 - t0 - nap) / N:6.2f} ms/step")


if __name__ == "__main__":
    main()
