"""Experiment: k train steps per executable launch (lax.scan over batches).

The round-3 profile shows ~7.5 ms device-busy per step while the best
pipelined wall window is ~10.5-11.5 ms — a ~3 ms/step host/tunnel dispatch
gap (consistent with the measured ~1.5 ms per-executable launch floor plus
single-core host python).  If scanning k steps inside ONE jitted call (with
the k batches stacked on a leading axis) recovers that gap, multi-step
dispatch becomes a production knob.

Run on TPU:  PYTHONPATH=. python benchmarks/bench_multistep.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    trainer = Trainer(ExperimentConfig(**PRODUCTION_CONFIG))
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    K = 4
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(K)]
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    key = jax.random.PRNGKey(0)

    # single-step reference (the production dispatch)
    state1 = state
    state1, loss, _ = trainer._train_step(state1, batches[0], key)
    jax.block_until_ready(loss)
    windows = []
    for w in range(4):
        t0 = time.perf_counter()
        for i in range(2 * K):
            state1, loss, _ = trainer._train_step(
                state1, batches[i % K], jax.random.fold_in(key, w * 100 + i))
        jax.block_until_ready(loss)
        windows.append((time.perf_counter() - t0) / (2 * K))
    single_ms = min(windows) * 1e3

    # K steps per launch: scan the SAME step function over stacked batches
    @jax.jit
    def multi_step(state, stacked, key):
        def body(carry, xs):
            st, i = carry
            batch = xs
            st, loss, _ = trainer._step_fn(st, batch,
                                           jax.random.fold_in(key, i))
            return (st, i + 1), loss

        (state, _), losses = jax.lax.scan(body, (state, 0), stacked)
        return state, losses

    # trainer._train_step is the jitted wrapper; reuse its underlying fn if
    # exposed, else inline the same computation by calling through it
    # (jit-of-jit inlines)
    trainer._step_fn = trainer._train_step

    state2 = trainer.init_state()
    state2, losses = multi_step(state2, stacked, key)
    jax.block_until_ready(losses)
    windows = []
    for w in range(4):
        t0 = time.perf_counter()
        for i in range(2):
            state2, losses = multi_step(state2, stacked,
                                        jax.random.fold_in(key, 7 * w + i))
        jax.block_until_ready(losses)
        windows.append((time.perf_counter() - t0) / (2 * K))
    multi_ms = min(windows) * 1e3

    print(json.dumps({
        "single_step_ms": round(single_ms, 2),
        "multi_step_ms_per_step": round(multi_ms, 2),
        "K": K,
        "speedup": round(single_ms / multi_ms, 2),
        "single_dps": round(BATCH / single_ms * 1e3, 1),
        "multi_dps": round(BATCH / multi_ms * 1e3, 1)}))


if __name__ == "__main__":
    main()
