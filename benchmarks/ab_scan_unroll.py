"""A/B the GCNII layer-scan unroll factor on the flagship train step.

Variants compile once each, then timing rounds interleave the variants
(A B C, A B C, ...) so shared-tunnel drift hits every variant equally.
Reports the per-variant median of per-round blocked step times plus the
best pipelined window.

Usage: python benchmarks/ab_scan_unroll.py [unrolls...]   (default: 2 4 full)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, NLAYERS, make_batch  # noqa: E402


def build(unroll):
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=NLAYERS, batch_size=BATCH,
        speaker_weights="3-0-1", gcn_compute_dtype="bfloat16",
        gcn_scan_unroll=unroll)
    trainer = Trainer(cfg)
    return trainer, trainer.init_state()


def main():
    import jax

    names = sys.argv[1:] or ["2", "4", "full"]
    unrolls = [None if n == "full" else int(n) for n in names]

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    variants = []
    for name, u in zip(names, unrolls):
        t0 = time.perf_counter()
        trainer, state = build(u)
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] unroll={name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
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
        print(f"unroll={v['name']:>4}: blocked_median={bl * 1e3:7.2f}ms "
              f"({BATCH / bl:7.1f} dps)  best_window={best * 1e3:7.2f}ms "
              f"({BATCH / best:7.1f} dps)  windows="
              + " ".join(f"{w * 1e3:.1f}" for w in v["windows"]), flush=True)


if __name__ == "__main__":
    main()
