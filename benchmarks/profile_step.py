"""Capture a TPU op-level profile of the flagship train step.

Traces N steps with ``jax.profiler``, parses the resulting xplane proto via
``tensorboard_plugin_profile`` and prints the top ops/categories by
device-side self time — the reproducible version of the step-time
attribution quoted in DESIGN.md.

Usage: python benchmarks/profile_step.py [trace_dir] [key=value ...]

Extra ``key=value`` args override PRODUCTION_CONFIG fields (same literal
parsing as ab_config.py) so a candidate knob's device-busy time can be
compared against the baseline with the profiler's noise-free numbers.
"""

import ast
import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, PRODUCTION_CONFIG, make_batch  # noqa: E402

# trace_dir is optional: positional args are split by shape, so
# `profile_step.py gcn_bwd_block=4` profiles the OVERRIDDEN config in the
# default trace dir rather than silently treating the knob as a directory.
_POSITIONAL = [a for a in sys.argv[1:] if "=" not in a]
TRACE_DIR = _POSITIONAL[0] if _POSITIONAL else "/tmp/tpu_trace_prof"
OVERRIDES = {}
for _kv in [a for a in sys.argv[1:] if "=" in a]:
    _k, _v = _kv.split("=", 1)
    try:
        OVERRIDES[_k] = ast.literal_eval(_v)
    except (ValueError, SyntaxError):
        OVERRIDES[_k] = _v


def capture(trace_dir):
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache
    from mmdfn_tpu.train import Trainer

    enable_compilation_cache()
    if OVERRIDES:
        print(f"config overrides: {OVERRIDES}")
    trainer = Trainer(ExperimentConfig(**{**PRODUCTION_CONFIG, **OVERRIDES}))
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    # compiler-reported FLOP / byte totals for ONE step (before running:
    # the step donates `state`, so lower with the live buffers first)
    try:
        ca = trainer._train_step.lower(
            state, batches[0], key).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
    except Exception as e:  # cost_analysis availability varies per backend
        print(f"cost_analysis unavailable: {e}")
        ca = {}

    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)

    with jax.profiler.trace(trace_dir):
        for i in range(10):
            state, loss, _ = trainer._train_step(
                state, batches[i % len(batches)], jax.random.fold_in(key, i))
        jax.block_until_ready(loss)
    return ca


# TPU v5e (lite) single-chip public peaks; the denominator for MFU.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_GBPS = 819e9


def mfu_report(ca, busy_ms):
    """Quantify utilization: compiler FLOPs/bytes over profiler busy time.

    MFU here = achieved FLOP/s vs the bf16 MXU peak (197 TFLOP/s on v5e);
    f32 matmuls decompose to multiple MXU passes, so the f32-dominated
    flagship's ceiling is lower than this denominator — the point of the
    metric is a stable round-over-round denominator, not hardware praise.
    """
    flops = float(ca.get("flops", 0.0))
    # "bytes accessed" is the compiler's LOGICAL byte count (VMEM-resident
    # reuse included), so logical_gbps can exceed physical HBM bandwidth —
    # it upper-bounds traffic; the ratio is still a stable denominator
    logical_bytes = float(ca.get("bytes accessed", 0.0))
    out = {"flops_per_step": flops, "logical_bytes_per_step": logical_bytes,
           "device_busy_ms": round(busy_ms, 3)}
    if busy_ms > 0 and flops > 0:
        t = busy_ms / 1e3
        out["achieved_tflops"] = round(flops / t / 1e12, 3)
        out["pct_peak_bf16"] = round(100 * flops / t / V5E_PEAK_BF16_FLOPS, 2)
        out["logical_gbps"] = round(logical_bytes / t / 1e9, 1)
        out["logical_vs_hbm_bw"] = round(
            100 * logical_bytes / t / V5E_HBM_GBPS, 1)
    print("\n-- MFU --")
    print(json.dumps(out))


def summarize(trace_dir, top=25):
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:  # older image: tensorboard plugin namespace
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # gviz table JSON: [{cols: [{id,label,...}], rows: [{c: [{v}, ...]}]}]
    table = json.loads(data)[0]
    ids = [c["id"] for c in table["cols"]]

    def get(row, name):
        v = row["c"][ids.index(name)]
        return v["v"] if v else None

    def num(row, name):
        v = get(row, name)
        return float(v) if v is not None else 0.0

    dev = [r for r in table["rows"] if get(r, "host_or_device") == "Device"]
    dev.sort(key=lambda r: -num(r, "total_self_time"))
    total = sum(num(r, "total_self_time") for r in dev)
    busy = sum(num(r, "total_self_time") for r in dev
               if get(r, "type") != "IDLE")
    busy_ms = busy / 1e4
    print(f"device total {total / 1e4:.3f} ms/step, busy {busy / 1e4:.3f} "
          f"ms/step (10-step trace)")
    by_type = {}
    for r in dev:
        t = get(r, "type")
        by_type.setdefault(t, [0.0, 0])
        by_type[t][0] += num(r, "total_self_time")
        by_type[t][1] += int(get(r, "occurrences") or 0)
    print("\n-- by op type --")
    for t, (us, n) in sorted(by_type.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"{t:>28}: {us / 1e4:7.3f} ms/step  ({n} occurrences, "
              f"{100 * us / total:4.1f}%)")
    print("\n-- top ops --")
    for r in dev[:top]:
        bound = get(r, "bound_by") or ""
        print(f"{num(r, 'total_self_time') / 1e4:8.4f} ms/step  "
              f"{get(r, 'type'):>16} {bound:>8}  "
              f"{str(get(r, 'operation'))[:100]}")
    return busy_ms


if __name__ == "__main__":
    trace_dir = TRACE_DIR
    cost = capture(trace_dir)
    busy = summarize(trace_dir)
    mfu_report(cost, busy)
