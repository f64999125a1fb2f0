"""Benchmark: fused Pallas GCNII stack vs the XLA lax.scan formulation.

Flagship eval shapes: B=32 dialogues, N=3*80=240 nodes, H=100, 16 layers,
reason-LSTM on.  Run on TPU:  python benchmarks/bench_gcnii_pallas.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmdfn_tpu.ops import gcnii_stack_fused

B, N, H, NLAYERS = 32, 240, 100, 16
ALPHA = 0.2


def xla_scan(adj, h, h0, W, theta, lstm_ih, lstm_hh, lstm_b):
    def body(carry, xs):
        h, lh, lc = carry
        W_i, theta_i = xs
        q = h
        g = h @ lstm_ih + lh @ lstm_hh + lstm_b
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        lc = jax.nn.sigmoid(f) * lc + jax.nn.sigmoid(i) * jnp.tanh(gg)
        lh = jax.nn.sigmoid(o) * jnp.tanh(lc)
        hi = jnp.einsum("bnm,bmh->bnh", adj, lh)
        support = jnp.concatenate([hi, h0], axis=-1)
        r = (1 - ALPHA) * hi + ALPHA * h0
        h = jax.nn.relu(theta_i * (support @ W_i) + (1 - theta_i) * r) + q
        return (h, lh, lc), None

    z = jnp.zeros_like(h)
    (h, _, _), _ = jax.lax.scan(body, (h, z, z), (W, theta))
    return h


R = 8   # in-jit chained stack applications per executable: round 3 found a
        # ~1.5 ms per-executable launch floor over the tunnel that made
        # every single-call variant read the same (the round-2 'parity'
        # verdict here was launch-floor-bound); timeit divides by R.


def timeit(fn, h_arg, *args, steps=20):
    """Chain the hidden state through successive calls: the data dependency
    forces sequential device execution.  Pipelining independent calls and
    blocking only on the last (the original formulation) produced ghost
    readings over the tunneled chip — 0.032 ms for a stack whose honest
    time is ~1.8 ms — because the async queue acks before execution."""
    out = fn(h_arg, *args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        x = h_arg
        t0 = time.perf_counter()
        for _ in range(steps):
            x = fn(x, *args)
        jax.block_until_ready(x)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best / R


def main():
    rng = np.random.default_rng(0)
    adj = jnp.array(rng.standard_normal((B, N, N)).astype(np.float32)) / N
    h = jnp.array(np.abs(rng.standard_normal((B, N, H))).astype(np.float32))
    h0 = h
    W = jnp.array(rng.standard_normal((NLAYERS, 2 * H, H)).astype(np.float32)) * 0.1
    theta = jnp.log(0.5 / jnp.arange(1, NLAYERS + 1) + 1.0)
    lstm_ih = jnp.array(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    lstm_hh = jnp.array(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.1
    lstm_b = jnp.array(rng.standard_normal((4 * H,)).astype(np.float32)) * 0.1

    def repeat(stack_fn):
        def f(x):
            for _ in range(R):
                x = stack_fn(x) * 0.1       # keep magnitudes bounded
            return x
        return jax.jit(f)

    xla_jit = repeat(lambda x: xla_scan(adj, x, h0, W, theta,
                                        lstm_ih, lstm_hh, lstm_b))
    t_xla = timeit(xla_jit, h)

    fused = repeat(lambda x: gcnii_stack_fused(
        adj, x, h0, W, theta, lstm_ih, lstm_hh, lstm_b,
        alpha=ALPHA, variant=True, reason=True))
    t_pal = timeit(fused, h)

    # numerical agreement on-device
    ref = xla_jit(h)
    got = fused(h)
    err = float(jnp.max(jnp.abs(ref - got)))

    print(json.dumps({
        "xla_scan_ms": round(t_xla * 1e3, 3),
        "pallas_fused_ms": round(t_pal * 1e3, 3),
        "speedup": round(t_xla / t_pal, 2),
        "max_abs_err": err,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
