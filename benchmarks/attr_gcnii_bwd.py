"""Attribute the GCNII backward kernel's time to its component regions.

VERDICT r3 weak #2: the bwd kernel sits at ~2x its DMA+MXU roofline and the
remaining gap had no per-region attribution.  The xplane op profile cannot
see inside one Mosaic kernel, so this bench measures by STATIC ABLATION:
``MMDFN_GCNII_BWD_ABLATE`` (read at trace time, ops/pallas_gcnii_train.py)
removes one gradient region per variant — its cost is the time difference
against the unablated kernel.  Ablated gradients are wrong; this is a
timing instrument only.

Buckets:
  wgrad     per-layer conv weight-grad dots (dW1/dW2)
  dadj      per-b adjacency-gradient dots
  prng      dropout PRNG re-draws (hardware PRNG, per (b, layer))
  lstmgrad  reason-LSTM gradient chain (gate-grad VPU work + its dots)
  remainder everything un-ablatable: the serial recompute + input-grad dot
            chain (adj^T, conv, d_hi), elementwise grads, residual DMA

Also prints the analytic DMA and MXU floors for the bwd pallas_call so the
measured remainder can be judged against physics.

Run on TPU:  PYTHONPATH=. python benchmarks/attr_gcnii_bwd.py
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmdfn_tpu.ops.pallas_gcnii_train import gcnii_stack_train

B, N, H, NL = 32, 240, 100, 16
ALPHA, RATE, BK = 0.2, 0.4, 2
R = 6                      # in-jit reps per executable (tunnel launch floor)
Np, Hp = 256, 128          # padded kernel shapes

V5E_PEAK_BF16 = 197e12
V5E_HBM_GBPS = 819e9

ABLATIONS = ["", "wgrad", "dadj", "prng", "lstmgrad",
             "wgrad,dadj,prng,lstmgrad"]


def timeit(fn, x, steps=10):
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
    return best / R


def analytic_floors():
    """DMA bytes and MXU FLOPs of the bwd pallas_call at these shapes."""
    bf, f32 = 2, 4
    # Block re-fetch model: specs indexed only by b fetch once per batch
    # block; specs indexed by j re-fetch per layer block.  Bk=2 -> K=4,
    # nlb = NL//K grid steps per batch block.
    K = 4
    nlb = NL // K
    res = 3 * B * NL * Np * Hp * bf              # h/lh/lc residual reads
    adj_in = B * Np * Np * bf                    # adj, once per batch block
    h0_in = B * Np * Hp * bf
    dhf_in = B * Np * Hp * f32
    w_in = (B // BK) * nlb * K * 2 * Hp * Hp * bf    # W1+W2 blocks, per (b,j)
    outs = B * (2 * Np * Hp + Np * Np) * f32     # dhe, dh0, dadj
    wg_out = (NL * 2 * Hp * Hp + 2 * Hp * 4 * Hp + 4 * Hp) * f32
    total_bytes = res + adj_in + h0_in + dhf_in + w_in + outs + wg_out

    # MXU flops per (b, layer): recompute (2 LSTM dots Hpx4Hp, adj NpxNp,
    # 2 conv HpxHp) + grads (2 wgrad, 2 input-grad, adj^T, dadj, 3 LSTM)
    d = lambda m, k, n: 2 * m * k * n
    per_bl = (2 * d(Np, Hp, 4 * Hp) + d(Np, Np, Hp) + 2 * d(Np, Hp, Hp)
              + 2 * d(Hp, Np, Hp) + 2 * d(Np, Hp, Hp)
              + d(Np, Np, Hp) + d(Np, Hp, Np)
              + d(Np, Hp, 4 * Hp) + d(Np, Hp, 4 * Hp) + d(Hp, Np, 4 * Hp))
    flops = B * NL * per_bl
    return dict(dma_bytes=total_bytes,
                dma_floor_ms=round(total_bytes / V5E_HBM_GBPS * 1e3, 4),
                mxu_flops=flops,
                mxu_floor_ms=round(flops / V5E_PEAK_BF16 * 1e3, 4))


def main():
    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    adj = f32(B, N, N) / N
    adj = (adj + jnp.swapaxes(adj, 1, 2)) / 2
    he = jnp.abs(f32(B, N, H))
    h0 = jnp.abs(f32(B, N, H))
    W = f32(NL, 2 * H, H) * 0.1
    theta = jnp.log(0.5 / jnp.arange(1, NL + 1) + 1.0)
    lih, lhh, lb = f32(H, 4 * H) * 0.1, f32(H, 4 * H) * 0.1, f32(4 * H) * 0.1

    def stack(x):
        return gcnii_stack_train(adj, x, h0, W, theta, lih, lhh, lb,
                                 alpha=ALPHA, reason=True, rate=RATE,
                                 seed=5, bwd_batch_block=BK)

    def chain_fwd():
        def step(x):
            for _ in range(R):
                x = 0.999 * stack(x)
            return x
        return jax.jit(step)

    def chain_fwdbwd():
        def loss(x):
            return jnp.sum(stack(x))

        def step(x):
            for _ in range(R):
                x = x - 1e-4 * jax.grad(loss)(x)
            return x
        return jax.jit(step)

    t_fwd = timeit(chain_fwd(), he)
    times = {}
    for ab in ABLATIONS:
        os.environ["MMDFN_GCNII_BWD_ABLATE"] = ab
        try:
            times[ab] = timeit(chain_fwdbwd(), he)
        finally:
            os.environ.pop("MMDFN_GCNII_BWD_ABLATE", None)

    base_bwd = times[""] - t_fwd
    rows = {"fwd_ms": round(t_fwd * 1e3, 3),
            "fwdbwd_ms": round(times[""] * 1e3, 3),
            "bwd_ms": round(base_bwd * 1e3, 3)}
    comp = {}
    for ab in ABLATIONS[1:-1]:
        comp[ab] = round((times[""] - times[ab]) * 1e3, 3)
    all_ab = ABLATIONS[-1]
    comp["sum_of_components"] = round(sum(
        (times[""] - times[a]) * 1e3 for a in ABLATIONS[1:-1]), 3)
    # bwd time left with every named component ablated IS the remainder
    comp["remainder_ms"] = round((times[all_ab] - t_fwd) * 1e3, 3)
    # cross-check: bwd_ms should ~= sum_of_components + remainder_ms
    comp["attribution_gap_ms"] = round(
        base_bwd * 1e3 - comp["sum_of_components"] - comp["remainder_ms"], 3)
    rows["components"] = comp
    rows["floors"] = analytic_floors()
    rows["note"] = ("remainder = serial recompute + input-grad dot chain + "
                    "elementwise + residual DMA (un-ablatable); components "
                    "measured by difference vs the unablated kernel")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
