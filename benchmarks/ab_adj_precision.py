"""A/B: adjacency cosine matmul precision HIGHEST (6 bf16 passes) vs HIGH (3).

VERDICT r3 next-step #6 asks for a measured verdict on the last unfused
region (~0.5 ms: adjacency build + classifier head).  The region's FLOPs are
dominated by the similarity einsums, which run at ``Precision.HIGHEST``
because arccos amplifies bf16 cosine error near +/-1 (CLAUDE.md numerics
trap).  HIGH halves the MXU passes; this bench measures (a) what that error
actually is on hardware against the HIGHEST result, and (b) what the step
time saves — the standard interleaved methodology (same as ab_config.py).

The knob is trace-time env ``MMDFN_ADJ_PRECISION`` (graph/adjacency.py);
each trainer's step is warmed (= traced) inside its env setting.

Run on TPU:  PYTHONPATH=. python benchmarks/ab_adj_precision.py
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402

ROUNDS, STEPS = 5, 12


def build(precision, rng, key):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    os.environ["MMDFN_ADJ_PRECISION"] = precision
    try:
        trainer = Trainer(ExperimentConfig(**PRODUCTION_CONFIG))
        state = trainer.init_state()
        batches = [make_batch(rng, BATCH, BUCKET) for _ in range(3)]
        t0 = time.perf_counter()
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)     # trace + compile under this env
        print(f"[compile] {precision}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    finally:
        os.environ.pop("MMDFN_ADJ_PRECISION", None)
    return dict(name=precision, trainer=trainer, state=state,
                batches=batches, blocked=[], windows=[])


def numeric_check(rng):
    """Max |adj_high - adj_highest| of the normalized flagship adjacency on
    hardware (fresh traces per env setting)."""
    from mmdfn_tpu.graph.adjacency import mm_big_adjacency

    feats = [jnp.asarray(rng.standard_normal((8, 80, 100)), jnp.float32)
             for _ in range(3)]
    umask = jnp.ones((8, 80), jnp.float32)
    out = {}
    for p in ("highest", "high", "default"):
        os.environ["MMDFN_ADJ_PRECISION"] = p
        try:
            out[p] = np.asarray(jax.jit(
                lambda f, u: mm_big_adjacency(f, u))(feats, umask))
        finally:
            os.environ.pop("MMDFN_ADJ_PRECISION", None)
    return dict(
        high_vs_highest=float(np.abs(out["high"] - out["highest"]).max()),
        default_vs_highest=float(
            np.abs(out["default"] - out["highest"]).max()))


def main():
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    errs = numeric_check(rng)
    print("numeric:", json.dumps(errs), flush=True)

    variants = [build("highest", rng, key), build("high", rng, key)]
    wins = 0
    for r in range(ROUNDS):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss, _ = v["trainer"]._train_step(
                v["state"], v["batches"][r % 3],
                jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        pair = []
        for v in variants:
            t0 = time.perf_counter()
            for i in range(STEPS):
                v["state"], loss, _ = v["trainer"]._train_step(
                    v["state"], v["batches"][i % 3],
                    jax.random.fold_in(key, 1000 + r * STEPS + i))
            jax.block_until_ready(loss)
            pair.append((time.perf_counter() - t0) / STEPS)
            v["windows"].append(pair[-1])
        wins += pair[1] < pair[0]

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(json.dumps({
        "numeric_max_abs": errs,
        "highest_ms": dict(
            blocked_median=round(med(variants[0]["blocked"]) * 1e3, 3),
            window_best=round(min(variants[0]["windows"]) * 1e3, 3),
            window_median=round(med(variants[0]["windows"]) * 1e3, 3)),
        "high_ms": dict(
            blocked_median=round(med(variants[1]["blocked"]) * 1e3, 3),
            window_best=round(min(variants[1]["windows"]) * 1e3, 3),
            window_median=round(med(variants[1]["windows"]) * 1e3, 3)),
        "high_window_wins": f"{wins}/{ROUNDS}"}))


if __name__ == "__main__":
    main()
