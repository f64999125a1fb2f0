"""Capture a TPU op-level profile of the flagship train step.

Traces N steps with ``jax.profiler``, parses the resulting xplane proto via
``tensorboard_plugin_profile`` and prints the top ops/categories by
device-side self time — the reproducible version of the step-time
attribution quoted in DESIGN.md.

Usage: python benchmarks/profile_step.py [trace_dir]
"""

import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, BUCKET, NLAYERS, make_batch  # noqa: E402


def capture(trace_dir):
    import jax

    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=NLAYERS, batch_size=BATCH,
        speaker_weights="3-0-1", gcn_compute_dtype="bfloat16")
    trainer = Trainer(cfg)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    batches = [make_batch(rng, BATCH, BUCKET) for _ in range(4)]
    key = jax.random.PRNGKey(0)

    state, loss, _ = trainer._train_step(state, batches[0], key)
    jax.block_until_ready(loss)

    with jax.profiler.trace(trace_dir):
        for i in range(10):
            state, loss, _ = trainer._train_step(
                state, batches[i % len(batches)], jax.random.fold_in(key, i))
        jax.block_until_ready(loss)


def summarize(trace_dir, top=25):
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    # framework_op_stats CSV: columns include rank, host/device, op type,
    # op name, occurrences, total time, avg, total self time ...
    lines = data.strip().split("\n")
    header = lines[0].split(",")

    def col(name):
        return header.index(name)

    rows = [l.split(",") for l in lines[1:]]
    dev = [r for r in rows if r[col("host_or_device")] == "Device"]
    key_self = col("total_self_time_us" if "total_self_time_us" in header
                   else "total_self_time")
    dev.sort(key=lambda r: -float(r[key_self]))
    total = sum(float(r[key_self]) for r in dev)
    print(f"device total self time: {total / 1e3:.2f} ms over 10 steps "
          f"({total / 1e4:.3f} ms/step)")
    by_type = {}
    for r in dev:
        by_type.setdefault(r[col("op_type")], [0.0, 0])
        by_type[r[col("op_type")]][0] += float(r[key_self])
        by_type[r[col("op_type")]][1] += 1
    print("\n-- by op type --")
    for t, (us, n) in sorted(by_type.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"{t:>28}: {us / 1e4:7.3f} ms/step  ({n} ops, "
              f"{100 * us / total:4.1f}%)")
    print("\n-- top ops --")
    name_c = col("op_name")
    for r in dev[:top]:
        print(f"{float(r[key_self]) / 1e4:8.4f} ms/step  "
              f"{r[col('op_type')]:>20}  {r[name_c][:90]}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_trace_prof"
    capture(trace_dir)
    summarize(trace_dir)
