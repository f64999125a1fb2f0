"""Benchmark: fused Pallas bi-GRU recurrence vs the XLA lax.scan pair.

One BiRNN layer's hidden recurrence at the flagship shapes — the step's
measured latency ceiling (DESIGN.md round-2 op profile).  Two batch sizes:
B=32 (the text encoder ``lstm_l``) and B=64 (the fused CRN party scan,
B*P with P=2).  Chained data dependencies between timed iterations (the
tunneled chip acks async dispatch before execution; see
bench_gcnii_pallas.timeit), and R=8 chained layer applications INSIDE one
jit: the first run of this bench measured every variant at ~1.5-1.6 ms
regardless of content (fwd == fwd+bwd == pallas == scan) — a per-
executable launch floor on the tunneled chip that swamps a single layer's
device time.  In-jit repetition amortizes it 8x.

Run on TPU:  PYTHONPATH=. python benchmarks/bench_rnn_pallas.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.rnn import _gru_scan
from mmdfn_tpu.ops.pallas_rnn import fused_bigru_layer

L, H = 80, 100


def timeit(fn, x, steps=20):
    out = fn(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        z = x
        t0 = time.perf_counter()
        for _ in range(steps):
            z = fn(z)
        jax.block_until_ready(z)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def bench_batch(B, rng):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    w_f, w_b = f(H, 3 * H) * 0.3, f(H, 3 * H) * 0.3
    b_f, b_b = f(3 * H) * 0.3, f(3 * H) * 0.3
    xg = (f(B, L, 3 * H), f(B, L, 3 * H))
    h0 = jnp.zeros((B, H))

    def scan_pair(a, remat=False):
        xg_f, xg_b = a
        ys_f, _ = _gru_scan(xg_f, w_f, b_f, h0, remat=remat)
        ys_b, _ = _gru_scan(xg_b, w_b, b_b, h0, remat=remat)
        return ys_f, ys_b

    def pallas_pair(a):
        return fused_bigru_layer(a[0], a[1], w_f, b_f, w_b, b_b)

    R = 8                      # chained layer applications per executable

    def chain_fwd(pair_fn):
        def step(a):
            for _ in range(R):
                ys_f, ys_b = pair_fn(a)
                a = (a[0] + 1e-3 * jnp.tile(ys_f, (1, 1, 3)),
                     a[1] + 1e-3 * jnp.tile(ys_b, (1, 1, 3)))
            return a
        return jax.jit(step)

    def chain_grad(pair_fn):
        def loss(a):
            ys_f, ys_b = pair_fn(a)
            return jnp.sum(ys_f) + jnp.sum(ys_b)

        def step(a):
            for _ in range(R):
                g = jax.grad(loss)(a)
                a = (a[0] - 1e-4 * g[0], a[1] - 1e-4 * g[1])
            return a
        return jax.jit(step)

    out = {}
    out["fwd_scan_ms"] = timeit(chain_fwd(scan_pair), xg) / R * 1e3
    out["fwd_pallas_ms"] = timeit(chain_fwd(pallas_pair), xg) / R * 1e3
    out["fwdbwd_scan_ms"] = timeit(chain_grad(scan_pair), xg) / R * 1e3
    out["fwdbwd_scan_remat_ms"] = timeit(
        chain_grad(lambda a: scan_pair(a, remat=True)), xg) / R * 1e3
    out["fwdbwd_pallas_ms"] = timeit(chain_grad(pallas_pair), xg) / R * 1e3

    ref = jax.jit(scan_pair)(xg)
    got = jax.jit(pallas_pair)(xg)
    out["max_abs_err"] = float(max(jnp.abs(r - g).max()
                                   for r, g in zip(ref, got)))
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in out.items()}


def main():
    rng = np.random.default_rng(0)
    res = {"platform": jax.devices()[0].platform, "L": L, "H": H}
    for B in (32, 64):
        res[f"B{B}"] = bench_batch(B, rng)
        res[f"B{B}"]["speedup_fwd"] = round(
            res[f"B{B}"]["fwd_scan_ms"] / res[f"B{B}"]["fwd_pallas_ms"], 2)
        res[f"B{B}"]["speedup_fwdbwd"] = round(
            res[f"B{B}"]["fwdbwd_scan_ms"]
            / res[f"B{B}"]["fwdbwd_pallas_ms"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
