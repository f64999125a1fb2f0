"""Streaming per-utterance inference (BASELINE.json stretch config).

Scenario: a dialogue arrives one utterance at a time; after each arrival the
serving path must emit an emotion prediction for the *newest* utterance with
low latency (p50 per-utterance latency is the headline serving metric).

Why prefix re-forward instead of purely incremental state: MM-DFN is not
causal — the text bi-GRU's backward direction and the dynamic cross-modal
adjacency both look at every utterance, so an arrival at time t changes the
hidden states of earlier positions too.  Any "incremental" scheme that
freezes earlier states diverges from the trained model.  The TPU-native
answer is to make the full prefix re-forward cheap and *statically shaped*:

* the dialogue prefix lives in fixed-size host buffers padded to length
  buckets, so each arrival runs one of a handful of pre-compiled forwards
  (no recompiles mid-dialogue);
* batch dimension is 1 and every op is tiny — exactly the fusion-friendly
  regime where one compiled XLA program beats eager op dispatch by orders of
  magnitude;
* warmup() pre-compiles every bucket so first-token latency is not a
  compile stall.

The returned prediction for utterance t is bitwise identical to running the
offline model on the length-t prefix (asserted in tests).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import bucket_length
from mmdfn_tpu.runtime import profiling
from mmdfn_tpu.train.trainer import Trainer, TrainState


class StreamingSession:
    """One live dialogue; ``append`` returns the newest utterance's label.

    The dialogue buffers live ON DEVICE: each append transfers only the new
    utterance's feature vectors (~KBs) and runs one jitted
    update-buffer-then-forward program per length bucket.  Shipping the full
    prefix from the host every step (the naive formulation) costs megabytes
    per utterance, which dominates p50 on anything but a local PCIe link.
    """

    def __init__(self, trainer: Trainer, state: TrainState,
                 buckets: Sequence[int] = (8, 16, 32, 64, 128, 200)):
        cfg = trainer.cfg
        info = cfg.info
        self.trainer = trainer
        # commit params to device ONCE: checkpoint restore yields host numpy
        # leaves, and uncommitted numpy args would re-upload every weight on
        # every append (tens of MB per utterance over a slow link)
        self.params = jax.device_put(state.params)
        self.buckets = tuple(buckets)
        self.n_speakers = info["n_speakers"]
        self._dims = (info["D_text"], info["D_audio"], info["D_visual"])
        self._Lmax = max(self.buckets)
        self.t = 0
        self._bufs = self._zero_bufs()

        model = trainer.model
        n_spk = self.n_speakers

        def append_predict(params, bufs, text, audio, visual, speaker, t, L):
            upd = lambda buf, v: jax.lax.dynamic_update_slice(
                buf, v[None, None].astype(buf.dtype), (0, t, 0))
            spk_vec = jax.nn.one_hot(speaker, n_spk, dtype=jnp.float32)
            bufs = dict(
                text=upd(bufs["text"], text),
                audio=upd(bufs["audio"], audio),
                visual=upd(bufs["visual"], visual),
                qmask=upd(bufs["qmask"], spk_vec))
            umask = (jnp.arange(L)[None, :] <= t).astype(jnp.float32)
            logp = model.apply(
                {"params": params}, bufs["text"][:, :L],
                bufs["qmask"][:, :L], umask, bufs["audio"][:, :L],
                bufs["visual"][:, :L], deterministic=True)
            return bufs, logp[0, t]

        self._append_predict = jax.jit(
            append_predict, static_argnames=("L",), donate_argnums=(1,))

    def _zero_bufs(self):
        D_t, D_a, D_v = self._dims
        L = self._Lmax
        z = lambda D: jnp.zeros((1, L, D), jnp.float32)
        return dict(text=z(D_t), audio=z(D_a), visual=z(D_v),
                    qmask=jnp.zeros((1, L, self.n_speakers), jnp.float32))

    # ------------------------------------------------------------------
    def warmup(self):
        """Pre-compile every bucket so serving never hits a compile stall."""
        D_t, D_a, D_v = self._dims
        zt, za, zv = (np.zeros(D, np.float32) for D in (D_t, D_a, D_v))
        for b in self.buckets:
            bufs, _ = self._append_predict(self.params, self._zero_bufs(),
                                           zt, za, zv, 0, 0, L=b)
            jax.block_until_ready(bufs["text"])

    def append(self, text: np.ndarray, audio: np.ndarray,
               visual: np.ndarray, speaker: int) -> Tuple[int, np.ndarray]:
        """Add one utterance; returns (predicted label, log-probs)."""
        t = self.t
        if t >= self._Lmax:
            raise ValueError("dialogue exceeds the largest bucket")
        if not 0 <= speaker < self.n_speakers:
            # jax.nn.one_hot would silently emit an all-zero speaker row
            raise ValueError(f"speaker {speaker} out of range "
                             f"[0, {self.n_speakers})")
        L = bucket_length(t + 1, self.buckets)
        self._bufs, logp = self._append_predict(
            self.params, self._bufs, jnp.asarray(text, jnp.float32),
            jnp.asarray(audio, jnp.float32), jnp.asarray(visual, jnp.float32),
            speaker, t, L=L)
        self.t = t + 1
        logp = np.asarray(logp)
        return int(np.argmax(logp)), logp

    def reset(self):
        self.t = 0
        self._bufs = self._zero_bufs()


def measure_latency(trainer: Trainer, state: TrainState, dialogues,
                    buckets=(8, 16, 32, 64, 128, 200),
                    warmup_dialogues: int = 0) -> Dict[str, float]:
    """Feed dialogues utterance-by-utterance; report per-utterance latency.

    ``warmup_dialogues`` replays the first k dialogues unrecorded before
    timing starts: ``warmup()`` covers compilation, but the very first
    appends still pay one-time costs (host-side tracing caches, tunnel
    connection reuse) that a long-lived server never sees again.
    """
    session = StreamingSession(trainer, state, buckets)
    session.warmup()
    for d in dialogues[:warmup_dialogues]:
        session.reset()
        for t in range(len(d)):
            spk = int(np.argmax(d.qmask[t]))
            session.append(d.text[t], d.audio[t], d.visual[t], spk)
    lat: List[float] = []
    used_buckets: List[int] = []
    for d in dialogues:
        session.reset()
        for t in range(len(d)):
            t0 = time.perf_counter()
            spk = int(np.argmax(d.qmask[t]))
            session.append(d.text[t], d.audio[t], d.visual[t], spk)
            lat.append(time.perf_counter() - t0)
            used_buckets.append(bucket_length(t + 1, session.buckets))
    lat_ms = np.asarray(lat) * 1e3

    # Split link vs compute: the wall numbers above include one host->device
    # transfer + one device->host logp pull per append (tunnel RTT).  Here
    # the same per-bucket jitted program is timed with chained on-device
    # buffers, blocking only once per K appends — the amortized per-append
    # DEVICE time, which still carries ~RTT/K of residual link cost (it
    # moved r03→r04's reading by ~0.3 ms on a slow-tunnel day).  The
    # profiler busy numbers below are the truly link-immune reading.
    device_ms_by_bucket: Dict[int, float] = {}
    busy_ms_by_bucket: Dict[int, float] = {}
    D_t, D_a, D_v = session._dims
    zt, za, zv = (jnp.zeros(D, jnp.float32) for D in (D_t, D_a, D_v))
    K = 20

    def run_k_appends(b, bufs=None):
        # one chained-K-append body shared by the wall-clock and profiler
        # passes, so both readings time the exact same append program;
        # buffer init stays OUTSIDE the wall-clock window (pass bufs in)
        # to keep device_ms comparable with the r02/r03 artifacts
        if bufs is None:
            bufs = session._zero_bufs()
        for _ in range(K):
            bufs, lp = session._append_predict(session.params, bufs,
                                               zt, za, zv, 0, 0, L=b)
        jax.block_until_ready(lp)
        return bufs

    for b in sorted(set(used_buckets)):
        bufs = run_k_appends(b)              # warm the per-bucket executable
        t0 = time.perf_counter()
        run_k_appends(b, bufs)
        device_ms_by_bucket[b] = (time.perf_counter() - t0) / K * 1e3

        # profiler-measured on-device busy time per append: sums what the
        # chip actually executed, so tunnel RTT and dispatch overhead
        # cannot contaminate it (None rows dropped when tooling is absent)
        busy = profiling.device_busy_ms(lambda: run_k_appends(b))
        if busy:        # None = no tooling; 0.0 = no device rows (CPU)
            busy_ms_by_bucket[b] = busy / K
    dev_ms = np.asarray([device_ms_by_bucket[b] for b in used_buckets])

    p = lambda a, q: round(float(np.percentile(a, q)), 3)
    out = dict(n=len(lat),
               p50_ms=p(lat_ms, 50), p90_ms=p(lat_ms, 90),
               p99_ms=p(lat_ms, 99),
               mean_ms=round(float(lat_ms.mean()), 3),
               device_p50_ms=p(dev_ms, 50), device_p99_ms=p(dev_ms, 99),
               link_p50_ms=round(p(lat_ms, 50) - p(dev_ms, 50), 3),
               device_ms_by_bucket={str(k): round(v, 3) for k, v
                                    in device_ms_by_bucket.items()})
    if busy_ms_by_bucket:
        # index only the buckets whose trace succeeded: a transient xplane
        # failure on one bucket must not discard the whole artifact
        busy_ms = np.asarray([busy_ms_by_bucket[b] for b in used_buckets
                              if b in busy_ms_by_bucket])
        out["device_busy_p50_ms"] = p(busy_ms, 50)
        out["device_busy_ms_by_bucket"] = {
            str(k): round(v, 3) for k, v in busy_ms_by_bucket.items()}
    return out
