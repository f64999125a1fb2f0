"""Profiling, throughput metering, and debug instrumentation.

The reference's only perf artifact is a per-epoch wall-clock print
(``run_train_erc.py:555,629-631``) and its observability is stdout plus an
optional tensorboardX gradient-histogram dump (``run_train_erc.py:120-122``).
Build-side equivalents (SURVEY.md §5.1/§5.5):

* :class:`ThroughputMeter` — dialogues/sec + utterances/sec counters, the
  BASELINE.md first-class metrics;
* :func:`trace` — ``jax.profiler`` TensorBoard trace wrapper around any
  region (XLA op-level timeline, HBM usage);
* :func:`annotate` — named trace regions inside a step;
* :func:`debug_numerics` — jax nan/inf debugging toggle (§5.2: the
  deterministic functional step replaces the reference's need for cudnn
  determinism flags);
* :func:`grad_histograms` — per-parameter gradient histogram rows for the
  tensorboard flag surface, computed on-device as (counts, edges).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@dataclass
class ThroughputMeter:
    """Accumulates step timings into dialogues/sec and utterances/sec."""

    dialogues: int = 0
    utterances: int = 0
    seconds: float = 0.0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_dialogues: int, n_utterances: int):
        assert self._t0 is not None, "stop() without start()"
        self.seconds += time.perf_counter() - self._t0
        self.dialogues += n_dialogues
        self.utterances += n_utterances
        self._t0 = None

    @contextlib.contextmanager
    def step(self, n_dialogues: int, n_utterances: int):
        self.start()
        try:
            yield
        finally:
            self.stop(n_dialogues, n_utterances)

    @property
    def dialogues_per_sec(self) -> float:
        return self.dialogues / self.seconds if self.seconds else 0.0

    @property
    def utterances_per_sec(self) -> float:
        return self.utterances / self.seconds if self.seconds else 0.0

    def summary(self) -> Dict[str, float]:
        return dict(dialogues=self.dialogues, utterances=self.utterances,
                    seconds=round(self.seconds, 3),
                    dialogues_per_sec=round(self.dialogues_per_sec, 2),
                    utterances_per_sec=round(self.utterances_per_sec, 2))


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace over a region; no-op when ``log_dir`` is None.

    View with TensorBoard's profile plugin or Perfetto.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside a traced step (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_time_ms(run) -> Optional[tuple]:
    """``(busy_ms, total_ms)`` of everything ``run()`` executes on-device.

    Runs the callable under a ``jax.profiler`` trace and sums device op
    self-times from the xplane ``framework_op_stats`` table: ``busy_ms``
    excludes IDLE rows (the noise-free timing used by ``bench.py`` and the
    serving latency artifact — tunnel RTT and host dispatch overheads
    cannot contaminate it); ``total_ms`` includes IDLE, so
    ``total - busy`` is the traced on-device idle.  Returns None when the
    xplane tooling (xprof / tensorboard_plugin_profile) is unavailable or
    the trace fails; callers must treat that as "no device reading".

    The caller is responsible for making ``run`` block until its work is
    done (e.g. end with ``jax.block_until_ready``) so the trace contains
    every dispatched op.
    """
    import glob
    import json as _json
    import shutil
    import tempfile
    trace_dir = None
    try:
        trace_dir = tempfile.mkdtemp(prefix="busy_trace_")
        with jax.profiler.trace(trace_dir):
            run()
        try:
            from xprof.convert import raw_to_tool_data
        except ImportError:
            from tensorboard_plugin_profile.convert import raw_to_tool_data
        paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb",
                                 recursive=True))
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [paths[-1]], "framework_op_stats", {})
        table = _json.loads(data.decode() if isinstance(data, bytes)
                            else data)[0]
        ids = [c["id"] for c in table["cols"]]

        def col(row, name):
            v = row["c"][ids.index(name)]
            return v["v"] if v else None

        dev = [r for r in table["rows"]
               if col(r, "host_or_device") == "Device"]
        total_us = sum(float(col(r, "total_self_time") or 0.0) for r in dev)
        busy_us = sum(float(col(r, "total_self_time") or 0.0) for r in dev
                      if col(r, "type") != "IDLE")
        return busy_us / 1e3, total_us / 1e3
    except Exception:
        return None
    finally:
        # the xplane dump is fully parsed before return; traces are MBs
        # and this runs once per bucket per latency run — don't leak them
        if trace_dir is not None:
            shutil.rmtree(trace_dir, ignore_errors=True)


def device_busy_ms(run) -> Optional[float]:
    """Non-IDLE on-device time (ms) of ``run()``; see ``device_time_ms``."""
    t = device_time_ms(run)
    return None if t is None else t[0]


def enable_compilation_cache(path: Optional[str] = None,
                             min_compile_secs: float = 1.0):
    """Persistent XLA compilation cache across processes.

    TPU compiles of the 16-64 layer stacks take tens of seconds; the
    reference-style one-process-per-config sweep would pay that per combo.
    With the cache, recompiles of identical executables are disk hits.

    CPU backends are a NO-OP: XLA:CPU caches AOT machine code whose feature
    set is baked in at compile time, so an entry written on one host (or by
    the remote compile service) SEGFAULTS when deserialized on a host with
    different CPU features — observed as a hard crash inside
    ``compilation_cache.get_executable_and_time`` during the test suite.
    CPU compiles are seconds, not minutes; the cache only pays on TPU.
    """
    import os
    if jax.default_backend() != "tpu":
        return None
    path = path or os.environ.get(
        "MMDFN_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mmdfn_tpu",
                     "xla_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path


def debug_numerics(enable: bool = True):
    """Flip jax's nan/inf debugging (fails fast inside jit)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def grad_histograms_device(grads, bins: int = 64) -> Dict[str, Dict]:
    """Per-parameter gradient histograms computed INSIDE the jitted step.

    TPU-first version of the reference's per-batch
    ``writer.add_histogram(name, param.grad)`` (``run_train_erc.py:120-122``,
    ``209-211``): instead of transferring every full gradient tensor to the
    host each batch, the (counts, edges) plus the summary moments tensorboard
    wants are reduced on-device — the per-leaf transfer is ~0.5KB regardless
    of parameter size, so the observability flag doesn't serialize training.

    Returns ``{param_path: {counts, edges, min, max, sum, sum_sq, num}}``
    (device arrays when called under jit).
    """
    import jax.numpy as jnp

    out = {}
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        name = jax.tree_util.keystr(path)
        flat = jnp.ravel(g).astype(jnp.float32)
        counts, edges = jnp.histogram(flat, bins=bins)
        out[name] = dict(
            counts=counts, edges=edges, min=jnp.min(flat), max=jnp.max(flat),
            sum=jnp.sum(flat), sum_sq=jnp.sum(flat * flat),
            num=jnp.asarray(flat.size, jnp.int32))
    return out


def grad_histograms(grads, bins: int = 64) -> Dict[str, tuple]:
    """Per-parameter gradient histograms (tensorboard flag surface,
    reference ``run_train_erc.py:120-122``).  Returns
    ``{param_path: (counts, bin_edges)}`` as host numpy arrays."""
    out = {}
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        arr = np.asarray(g).ravel()
        out[name] = np.histogram(arr, bins=bins)
    return out


class JsonlWriter:
    """Append-only JSONL metric stream (structured step logs, §5.5)."""

    def __init__(self, path: str):
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, row: dict):
        import json
        self._f.write(json.dumps(row, default=float) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
