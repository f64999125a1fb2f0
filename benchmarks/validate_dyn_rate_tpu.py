"""Hardware validation: dynamic (config-stacked) dropout rate in the fused
GCNII train kernel.

The stacked sweep passes the dropout threshold/scale as SMEM operands
(ops/pallas_gcnii_train.py dyn mode) instead of baking them into the
compiled kernel.  On the CPU interpreter the PRNG is a zero stub, so only
the scale path is testable there (tests/test_drop_override.py); THIS script
runs on the real chip where `pltpu.prng_random_bits` draws real bits and
checks, bitwise:

  1. dyn-rate kernel == static-rate kernel (fwd AND grads) at rate>0 —
     same seed, same threshold formula => identical masks;
  2. jax.vmap over stacked DropRates: each slot == its per-rate static run
     (the Mosaic lowering of the vmapped SMEM scalars, cf. the round-4
     rank-2 seed fix);
  3. a full VmapSweep mixed-dropout production-kernel train step runs and
     each slot's loss equals a uniform-rate group's matching slot.

Writes DYNRATE_r05.json at the repo root.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from mmdfn_tpu.nn.drop_override import make_drop_rate
    from mmdfn_tpu.ops.pallas_gcnii_train import gcnii_stack_train
    from mmdfn_tpu.runtime.profiling import enable_compilation_cache

    enable_compilation_cache()
    out = dict(metric="dyn-rate kernel hardware validation", checks={})

    rng = np.random.default_rng(0)
    B, N, H, nl = 4, 96, 100, 16
    adj = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32) / N
    he = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(nl, 2 * H, H)), jnp.float32) * 0.1
    theta = jnp.log(0.5 / jnp.arange(1, nl + 1) + 1.0)
    lih = jnp.asarray(rng.normal(size=(H, 4 * H)), jnp.float32) * 0.1
    lhh = jnp.asarray(rng.normal(size=(H, 4 * H)), jnp.float32) * 0.1
    lb = jnp.asarray(rng.normal(size=(4 * H,)), jnp.float32) * 0.1
    seed = jnp.int32(1234)

    def run(rate, bk=2):
        return gcnii_stack_train(adj, he, h0, W, theta, lih, lhh, lb,
                                 alpha=0.2, reason=True, rate=rate,
                                 seed=seed, bwd_batch_block=bk)

    # 1. single dyn == static, fwd
    for r in (0.4, 0.2, 0.0):
        o_s = jax.jit(lambda: run(r))()
        o_d = jax.jit(lambda: run(make_drop_rate(r)))()
        eq = bool(jnp.array_equal(o_s, o_d))
        md = float(jnp.max(jnp.abs(o_s - o_d)))
        out["checks"][f"fwd_rate{r}"] = dict(bitwise=eq, maxdiff=md)
        print(f"fwd rate={r}: bitwise={eq} maxdiff={md}", flush=True)

    # grads
    def g(rate):
        return jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(
            gcnii_stack_train(adj, x, h0, W, theta, lih, lhh, lb,
                              alpha=0.2, reason=True, rate=rate, seed=seed,
                              bwd_batch_block=2)))))(he)
    g_s, g_d = g(0.4), g(make_drop_rate(0.4))
    eq = bool(jnp.array_equal(g_s, g_d))
    out["checks"]["grad_rate0.4"] = dict(
        bitwise=eq, maxdiff=float(jnp.max(jnp.abs(g_s - g_d))))
    print(f"grad rate=0.4: bitwise={eq}", flush=True)

    # 2. vmap over stacked rates == per-rate static runs
    rates = [0.0, 0.2, 0.4, 0.5]
    stacked = make_drop_rate(rates)
    outs = jax.jit(jax.vmap(lambda dr: run(dr, bk=None)))(stacked)
    vm_ok = {}
    for i, r in enumerate(rates):
        o_s = jax.jit(lambda r=r: run(r, bk=None))()
        vm_ok[str(r)] = bool(jnp.array_equal(outs[i], o_s))
    out["checks"]["vmap_slots_bitwise"] = vm_ok
    print("vmap slots == static:", vm_ok, flush=True)

    # 3. full mixed-dropout VmapSweep production step
    from bench import BUCKET, PRODUCTION_CONFIG, make_batch
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train.vmap_sweep import VmapSweep

    cfg = ExperimentConfig(**{**PRODUCTION_CONFIG, "batch_size": 8})
    combos = [dict(lr=1e-4, l2=1e-5, dropout=dp) for dp in (0.2, 0.4)]
    key = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(1)
    batch = make_batch(nprng, 8, BUCKET)

    def one_step(combos):
        sweep = VmapSweep(cfg, combos)
        params, opt = sweep.init_states()
        freeze = jnp.zeros((sweep.K,), jnp.float32)
        _, _, loss, _ = sweep._train_step(params, opt, batch, key, freeze)
        return np.asarray(loss)

    mixed = one_step(combos)
    uni = {dp: one_step([dict(lr=1e-4, l2=1e-5, dropout=dp)] * 2)
           for dp in (0.2, 0.4)}
    slot_eq = dict(slot0=bool(mixed[0] == uni[0.2][0]),
                   slot1=bool(mixed[1] == uni[0.4][1]))
    out["checks"]["vmap_sweep_production_step"] = dict(
        loss_mixed=[float(x) for x in mixed],
        loss_uniform={str(k): [float(x) for x in v]
                      for k, v in uni.items()},
        slot_loss_equal=slot_eq)
    print("production sweep step mixed:", mixed, "uniform:", uni,
          "slot_eq:", slot_eq, flush=True)

    out["ok"] = (all(c["bitwise"] for k, c in out["checks"].items()
                     if isinstance(c, dict) and "bitwise" in c)
                 and all(vm_ok.values()) and all(slot_eq.values()))
    with open("DYNRATE_r05.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    print("wrote DYNRATE_r05.json ok=", out["ok"], flush=True)


if __name__ == "__main__":
    main()
