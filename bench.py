"""Headline benchmark: flagship MM-DFN train-step throughput (dialogues/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference's flagship path (IEMOCAP GDF: trimodal
encoders + CRN speaker GRU + dynamic cross-modal adjacency + 16 GCNII layers
with reason-LSTM + focal loss + Adam), batch 32 dialogues of 20-80 turns with
real IEMOCAP feature dims (text 100 / audio 1582 / visual 342).

Baseline: the eager CPU PyTorch reference-equivalent measured by
``benchmarks/torch_cpu_baseline.py`` on THIS machine (single-core container):
0.784 dialogues/sec.  The build target is >=20x (BASELINE.md).
"""

import json
import time

import numpy as np

# measured by benchmarks/torch_cpu_baseline.py on this machine (1 CPU core,
# torch 2.x eager, batch 32, lengths U[20,80], 16 GCNII layers).  The date
# stamp travels in the JSON so round-over-round ratios stay attributable;
# re-measure with `python benchmarks/torch_cpu_baseline.py` when in doubt.
TORCH_CPU_BASELINE_DPS = 0.784     # re-measured round 4 after dropping the
                                   # baseline's extra shape-only GRU passes
                                   # (0.714 round 3, 0.712 round 2)
TORCH_CPU_BASELINE_DATE = "2026-08-19"

BATCH = 32
BUCKET = 80
STEPS = 48      # long windows amortize the tunnel RTT (see guard below)
NLAYERS = 16

# production flagship config — shared by bench.py, benchmarks/ab_config.py
# and benchmarks/profile_step.py so measurements always describe the same
# executable.  bf16 GCNII scan (+12%), remat'd RNN scan backward (+9%),
# the fused Pallas bi-GRU kernel (won all 5 interleaved window pairs,
# blocked median -6.5%, round 3) and the fused Pallas GCNII train stack
# (device busy 6.47 -> 4.90 ms/step, best A/B window +15% dps, round 3)
# are the measured-win knobs; full unroll is the TPU auto default.
# rnn_scan_remat stays on for the non-pallas scans (DialogueRNN paths);
# both pallas kernels' backwards always remat.  gcn_compute_dtype is kept
# for the CPU-fallback scan path (the pallas stack is bf16-matmul/f32-
# elementwise internally).
PRODUCTION_CONFIG = dict(
    dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
    class_weight=True, Deep_GCN_nlayers=NLAYERS, batch_size=BATCH,
    speaker_weights="3-0-1", gcn_compute_dtype="bfloat16",
    rnn_scan_remat=True, rnn_backend="pallas", gcn_backend="pallas",
    gcn_bwd_block=2, rng_impl="rbg")


def make_batch(rng, B, L):
    import jax.numpy as jnp
    lengths = rng.integers(20, L + 1, size=B)
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]

    def feat(D):
        return (rng.standard_normal((B, L, D), dtype=np.float32)
                * umask[..., None])

    return dict(
        text=jnp.asarray(feat(100)), audio=jnp.asarray(feat(1582)),
        visual=jnp.asarray(feat(342)), qmask=jnp.asarray(qmask),
        umask=jnp.asarray(umask),
        label=jnp.asarray((rng.integers(0, 6, size=(B, L))
                           * umask).astype(np.int32)))


def main():
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    cfg = ExperimentConfig(**PRODUCTION_CONFIG)
    trainer = Trainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    # warmup: compile + one executed step
    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)

    # reference timing with per-step blocking (immune to async anomalies)
    blocked = []
    for i in range(5):
        t0 = time.perf_counter()
        state, loss, _ = trainer._train_step(
            state, batches[i % len(batches)], jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(loss)
        blocked.append(time.perf_counter() - t0)
    blocked_dt = sorted(blocked)[len(blocked) // 2]

    # 5 pipelined windows: the chip is reached over a shared tunnel and
    # single-window readings can be inflated several-fold by contention.
    # Headline = MEDIAN window (best travels alongside) so round-over-round
    # deltas under the contention noise stay judgeable.
    windows = []
    for w in range(5):
        t0 = time.perf_counter()
        for i in range(STEPS):
            state, loss, _ = trainer._train_step(
                state, batches[i % len(batches)],
                jax.random.fold_in(key, w * STEPS + i))
        jax.block_until_ready(loss)
        windows.append((time.perf_counter() - t0) / STEPS)
    best_dt = min(windows)
    median_dt = sorted(windows)[len(windows) // 2]

    # noise-free secondary metric: on-device busy ms/step from a profiler
    # trace (immune to tunnel RTT); null if the xplane tooling is absent
    from mmdfn_tpu.runtime.profiling import device_busy_ms as _busy

    def _ten_steps():
        s = state
        for i in range(10):
            s, loss, _ = trainer._train_step(
                s, batches[i % len(batches)],
                jax.random.fold_in(key, 10_000 + i))
        jax.block_until_ready(loss)

    total_busy = _busy(_ten_steps)
    device_busy_ms = round(total_busy / 10, 3) if total_busy else None

    # plausibility guard: per-step blocking pays a full tunnel round-trip
    # that pipelining legitimately amortizes, but an async ghost reading
    # (dispatch acked before execution; a 40x one was observed once) must
    # not become the headline.  Two PHYSICAL floors replace the old
    # `blocked/8` heuristic, which misfired on a ~500ms-RTT day (it
    # rejected a valid 637-dps window and published the 60-dps blocked
    # number): (a) a window of STEPS steps ends with block_until_ready, so
    # its per-step time is >= busy + RTT/STEPS — amortization beyond
    # STEPSx is impossible; (b) wall time cannot undercut on-device busy
    # time when the profiler measured it.
    # (a) gives the full STEPSx amortization only when (b) can veto a
    # ghost; without the profiler (device_busy_ms None) the only anchor is
    # the blocked step, and a 40x ghost would clear blocked/48 — so the
    # profiler-less floor stays at the old 12-step window's bound.
    if device_busy_ms is not None:
        floor = max(blocked_dt / STEPS, 0.8 * device_busy_ms / 1e3)
    else:
        floor = blocked_dt / 12
    # headline = MEDIAN pipelined window (round 4; was best-of-5): the best
    # window rides the tunnel's optimistic tail, so round-over-round deltas
    # quoted from it conflate contention luck with real wins (VERDICT r3
    # weak #5).  The best window still travels in the JSON.
    med_ok = median_dt if median_dt >= floor else blocked_dt
    dps = BATCH / med_ok
    # blocked_dps (tunnel-round-trip-inclusive median) and window_spread
    # (max/min over the 5 pipelined windows) expose run-to-run variance so
    # round-over-round regressions under the noise floor stay visible
    # vs_baseline divides a bf16-scan TPU run by the f32 eager-torch CPU
    # baseline (the config string says so); baseline date-stamped above
    print(json.dumps({
        "metric": "MM-DFN flagship train dialogues/sec "
                  f"(B={BATCH}, L<=80, {NLAYERS} GCNII layers "
                  "fused-pallas bf16, MEDIAN pipelined window, "
                  f"{jax.devices()[0].platform})",
        "value": round(dps, 2),
        "unit": "dialogues/sec",
        "vs_baseline": round(dps / TORCH_CPU_BASELINE_DPS, 2),
        "baseline_dps": TORCH_CPU_BASELINE_DPS,
        "baseline_date": TORCH_CPU_BASELINE_DATE,
        # raw best window, always consistent with window_dps; best_window_ok
        # says whether it cleared the ghost floor (False = async-ghost
        # reading; quote the median/blocked numbers instead)
        "best_window_dps": round(BATCH / best_dt, 2),
        "best_window_ok": bool(best_dt >= floor),
        "blocked_dps": round(BATCH / blocked_dt, 2),
        "device_busy_ms": device_busy_ms,
        "window_dps": [round(BATCH / w, 2) for w in windows],
        "window_spread": round(max(windows) / min(windows), 3)}))


if __name__ == "__main__":
    main()
