"""MELD-config flagship throughput (the second headline dataset).

Same protocol as bench.py (warmup, blocked medians, best-of-3 pipelined
windows) but with the MELD shapes: 9 speakers, 7 classes, text 600 /
audio 300 / visual 342, dialogues of 5-33 turns (MELD dialogues are much
shorter than IEMOCAP's).  MELD's P=9 takes the gather path of
crn_party_delta (the one-hot matmul is gated to P<=4; DESIGN.md).

Prints one JSON line (informational — bench.py's IEMOCAP line is the
driver contract).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_batch(rng, B, L, n_speakers=9):
    import jax.numpy as jnp
    lengths = rng.integers(5, L + 1, size=B)
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, n_speakers, size=(B, L))
    qmask = np.zeros((B, L, n_speakers), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]

    def feat(D):
        return (rng.standard_normal((B, L, D), dtype=np.float32)
                * umask[..., None])

    return dict(
        text=jnp.asarray(feat(600)), audio=jnp.asarray(feat(300)),
        visual=jnp.asarray(feat(342)), qmask=jnp.asarray(qmask),
        umask=jnp.asarray(umask),
        label=jnp.asarray((rng.integers(0, 7, size=(B, L))
                           * umask).astype(np.int32)))


def main():
    import sys

    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    B, L = 32, 33
    # optional argv: layer count (32 = run_train_me.sh default grid depth;
    # 64 = the deepest published config, kernel-eligible since round 3)
    nl = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = ExperimentConfig(
        dataset="MELD", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=nl, batch_size=B,
        speaker_weights="0.5-0.5-1.5",
        buckets=(33,)).with_tpu_fast()
    trainer = Trainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, B, L) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)

    blocked = []
    for i in range(5):
        t0 = time.perf_counter()
        state, loss, _ = trainer._train_step(
            state, batches[i % 4], jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(loss)
        blocked.append(time.perf_counter() - t0)
    blocked_dt = sorted(blocked)[len(blocked) // 2]

    windows = []
    for w in range(5):
        t0 = time.perf_counter()
        for i in range(12):
            state, loss, _ = trainer._train_step(
                state, batches[i % 4], jax.random.fold_in(key, w * 12 + i))
        jax.block_until_ready(loss)
        windows.append((time.perf_counter() - t0) / 12)
    best_dt = min(windows)
    median_dt = sorted(windows)[len(windows) // 2]
    # median pipelined window, same headline policy as bench.py (round 4).
    # Ghost floor = blocked/12: a 12-step window ends with
    # block_until_ready, so amortizing the tunnel round-trip beyond 12x is
    # physically impossible (bench.py's profiler-less branch; the old
    # blocked/8 heuristic misfired on high-RTT days).
    dt = median_dt if median_dt >= blocked_dt / 12 else blocked_dt

    print(json.dumps({
        "metric": "MM-DFN MELD train dialogues/sec "
                  f"(B={B}, L<=33, P=9, {nl} GCNII layers, "
                  "MEDIAN pipelined window, "
                  f"{jax.devices()[0].platform})",
        "value": round(B / dt, 2),
        "unit": "dialogues/sec",
        "best_window_dps": round(B / best_dt, 2),
        "blocked_dps": round(B / blocked_dt, 2),
        "window_spread": round(max(windows) / min(windows), 3)}))


if __name__ == "__main__":
    main()
