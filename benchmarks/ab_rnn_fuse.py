"""A/B rnn_fuse_directions on the flagship train step (interleaved timing).

Same protocol as ab_scan_unroll.py: compile both variants, then interleave
blocked steps and pipelined windows so tunnel drift hits both equally.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, NLAYERS, make_batch  # noqa: E402


def build(fuse):
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=NLAYERS, batch_size=BATCH,
        speaker_weights="3-0-1", gcn_compute_dtype="bfloat16",
        rnn_fuse_directions=fuse)
    trainer = Trainer(cfg)
    return trainer, trainer.init_state()


def main():
    import jax

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    variants = []
    for fuse in (False, True):
        t0 = time.perf_counter()
        trainer, state = build(fuse)
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] fuse={fuse}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        variants.append(dict(name=str(fuse), trainer=trainer, state=state,
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
        print(f"fuse={v['name']:>5}: blocked_median={bl * 1e3:7.2f}ms "
              f"({BATCH / bl:7.1f} dps)  best_window={best * 1e3:7.2f}ms "
              f"({BATCH / best:7.1f} dps)  windows="
              + " ".join(f"{w * 1e3:.1f}" for w in v["windows"]), flush=True)


if __name__ == "__main__":
    main()
