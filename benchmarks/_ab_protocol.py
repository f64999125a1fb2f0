"""Shared interleaved A/B measurement protocol.

Round-robin interleaving of per-variant blocked steps and pipelined
windows, so shared-tunnel drift hits every variant equally — the only
wall-clock methodology that resolves config deltas below the tunnel's
noise floor (see DESIGN.md "Performance decisions" and the MELD
back-to-back-vs-interleaved cautionary tale).  One protocol
implementation serves `ab_config.py` (IEMOCAP flagship shapes) and
`ab_meld.py` (MELD shapes).
"""

import ast
import time


def parse_overrides(argv):
    """key=value args -> dict, values parsed as python literals."""
    overrides = {}
    for kv in argv:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    return overrides


def run_interleaved(build, variant_specs, batches, batch_size,
                    rounds=5, steps=8):
    """Run the interleaved protocol and print one result line per variant.

    ``build(overrides) -> (trainer, state)``; ``variant_specs`` is a list
    of (name, overrides).  Each round takes one blocked step then one
    ``steps``-step pipelined window per variant, in variant order.
    """
    import jax

    key = jax.random.PRNGKey(0)
    variants = []
    for name, ov in variant_specs:
        t0 = time.perf_counter()
        trainer, state = build(ov)
        state, loss, _ = trainer._train_step(state, batches[0], key)
        jax.block_until_ready(loss)
        print(f"[compile] {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        variants.append(dict(name=name, trainer=trainer, state=state,
                             blocked=[], windows=[]))

    for r in range(rounds):
        for v in variants:
            t0 = time.perf_counter()
            v["state"], loss, _ = v["trainer"]._train_step(
                v["state"], batches[r % len(batches)],
                jax.random.fold_in(key, 100 + r))
            jax.block_until_ready(loss)
            v["blocked"].append(time.perf_counter() - t0)
        for v in variants:
            t0 = time.perf_counter()
            for i in range(steps):
                v["state"], loss, _ = v["trainer"]._train_step(
                    v["state"], batches[i % len(batches)],
                    jax.random.fold_in(key, 1000 + r * steps + i))
            jax.block_until_ready(loss)
            v["windows"].append((time.perf_counter() - t0) / steps)

    for v in variants:
        bl = sorted(v["blocked"])[len(v["blocked"]) // 2]
        best = min(v["windows"])
        med = sorted(v["windows"])[len(v["windows"]) // 2]
        print(f"{v['name']}: blocked_median={bl * 1e3:7.2f}ms "
              f"({batch_size / bl:7.1f} dps)  "
              f"best_window={best * 1e3:7.2f}ms "
              f"({batch_size / best:7.1f} dps)  "
              f"median_window={med * 1e3:7.2f}ms "
              f"({batch_size / med:7.1f} dps)  windows="
              + " ".join(f"{w * 1e3:.1f}" for w in v["windows"]),
              flush=True)
    return variants
