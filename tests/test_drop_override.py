"""Traced dropout-rate override (nn/drop_override.py).

The config-stacked sweep replaces every cfg.dropout-derived static rate with
a traced per-config scalar.  These tests pin the two load-bearing claims:

* SITE COMPLETENESS — a flagship/relation/GF2 forward with the override
  installed is BITWISE equal to the same forward through a model rebuilt
  with the rate folded statically (same rngs).  Any dropout site that
  forgot to consult the override (or consults it when it should not —
  e.g. rec_dropout) breaks this.
* KERNEL DYNAMIC MODE — the fused GCNII train kernel accepts a DropRate
  whose threshold/scale ride as SMEM operands; on the CPU interpreter the
  hardware PRNG is a zero stub (all-keep), so the keep-SCALE path and the
  gradient wiring are checked here (the draw-threshold bit-parity with a
  static rate is pinned by construction: both thresholds come from the
  same exact integer formula; hardware equality is exercised by
  benchmarks/bench_gcnii_train_pallas.py's vmap leg on TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.models.dialogue_gnn import DialogueGNN
from mmdfn_tpu.nn import drop_override
from mmdfn_tpu.nn.drop_override import DropRate, make_drop_rate


def _inputs(rng, B=2, L=6, cfg=None):
    info = cfg.info
    text = jnp.asarray(rng.normal(size=(B, L, cfg.D_m)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(B, L, info["D_audio"])), jnp.float32)
    visual = jnp.asarray(rng.normal(size=(B, L, info["D_visual"])),
                         jnp.float32)
    qmask = jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, size=(B, L))),
                           info["n_speakers"])
    umask = jnp.ones((B, L), jnp.float32)
    return text, qmask, umask, audio, visual


def _forward(cfg, inputs, key, droprate=None):
    model = DialogueGNN.from_config(cfg)
    params = model.init(jax.random.PRNGKey(0), *inputs)["params"]
    rngs = {"dropout": key}
    if droprate is None:
        return model.apply({"params": params}, *inputs,
                           deterministic=False, rngs=rngs)
    with drop_override.override({"dropout": droprate}):
        return model.apply({"params": params}, *inputs,
                           deterministic=False, rngs=rngs)


@pytest.mark.parametrize("graph_type,extra", [
    ("GDF", dict(reason_flag=True)),
    ("relation", dict()),
    ("GF2", dict()),
])
def test_override_forward_equals_static_rebuild(graph_type, extra):
    """Override(0.2) on a dropout=0.4 model == a dropout=0.2 model, bitwise;
    and != the un-overridden 0.4 forward (the override actually bites)."""
    rng = np.random.default_rng(0)
    base = ExperimentConfig(dropout=0.4, Deep_GCN_nlayers=2,
                            graph_type=graph_type, **extra)
    inputs = _inputs(rng, cfg=base)
    key = jax.random.PRNGKey(42)

    over = _forward(base, inputs, key, droprate=make_drop_rate(0.2))
    static = _forward(ExperimentConfig(dropout=0.2, Deep_GCN_nlayers=2,
                                       graph_type=graph_type, **extra),
                      inputs, key)
    assert jnp.array_equal(over, static), graph_type

    plain = _forward(base, inputs, key)
    assert not jnp.array_equal(over, plain), graph_type


def test_override_grads_equal_static_rebuild_bitwise():
    """Backward too: grads of a loss through the override(0.2) forward are
    BITWISE equal to the dropout=0.2 static rebuild's (same masks, same
    arithmetic — the explicit inv_keep multiply keeps the compiled math
    identical; only vmapped sweep programs pick up ulp-level fusion drift,
    tolerated in test_vmap_sweep.py)."""
    rng = np.random.default_rng(5)
    base = ExperimentConfig(dropout=0.4, Deep_GCN_nlayers=2,
                            graph_type="GDF", reason_flag=True)
    inputs = _inputs(rng, cfg=base)
    key = jax.random.PRNGKey(42)

    def lossgrad(cfg, droprate=None):
        model = DialogueGNN.from_config(cfg)
        params = model.init(jax.random.PRNGKey(0), *inputs)["params"]

        def loss(p):
            if droprate is None:
                out = model.apply({"params": p}, *inputs,
                                  deterministic=False, rngs={"dropout": key})
            else:
                with drop_override.override({"dropout": droprate}):
                    out = model.apply({"params": p}, *inputs,
                                      deterministic=False,
                                      rngs={"dropout": key})
            return jnp.sum(out * jnp.sin(
                jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)))

        return jax.grad(loss)(params)

    g_over = lossgrad(base, make_drop_rate(0.2))
    g_stat = lossgrad(ExperimentConfig(dropout=0.2, Deep_GCN_nlayers=2,
                                       graph_type="GDF", reason_flag=True))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_over)[0],
            jax.tree_util.tree_flatten_with_path(g_stat)[0]):
        assert jnp.array_equal(a, b), jax.tree_util.keystr(pa)


def test_override_rate_zero_is_identity_with_static_zero():
    rng = np.random.default_rng(1)
    base = ExperimentConfig(dropout=0.4, Deep_GCN_nlayers=2,
                            graph_type="GDF", reason_flag=True)
    inputs = _inputs(rng, cfg=base)
    key = jax.random.PRNGKey(7)
    over = _forward(base, inputs, key, droprate=make_drop_rate(0.0))
    static = _forward(ExperimentConfig(dropout=0.0, Deep_GCN_nlayers=2,
                                       graph_type="GDF", reason_flag=True),
                      inputs, key)
    assert jnp.array_equal(over, static)


def test_make_drop_rate_thresholds_match_kernel_formula():
    """The host-side integer thresholds equal the kernel's static-rate
    formula bit for bit (that is what makes stacked draws == static draws
    on hardware)."""
    for r in (0.0, 0.2, 0.4, 0.5, 0.999):
        dr = make_drop_rate(r)
        expect = min(int((1.0 - r) * (1 << 32)), (1 << 32) - 1)
        got = int(np.asarray(dr.thresh).view(np.uint32))
        assert got == expect, r
    with pytest.raises(ValueError):
        make_drop_rate(1.0)
    with pytest.raises(ValueError):
        make_drop_rate(-0.1)
    stacked = make_drop_rate([0.2, 0.4])
    assert stacked.rate.shape == (2,)
    assert stacked.inv_keep.shape == (2,)


def test_kernel_dynamic_rate_scale_and_grads():
    """gcnii_stack_train with a traced DropRate (interpret mode: PRNG stubs
    all-keep, so the dynamic keep-scale path is what's visible): output ==
    static-rate kernel output, grads flow, and vmap over stacked rates
    gives each config its own scale."""
    from mmdfn_tpu.ops.pallas_gcnii_train import gcnii_stack_train

    rng = np.random.default_rng(3)
    B, N, H, nl = 2, 8, 8, 2
    adj = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32) / N
    he = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    h0 = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(nl, 2 * H, H)), jnp.float32) * 0.1
    theta = jnp.asarray([0.5, 0.3], jnp.float32)
    seed = jnp.int32(11)

    run = lambda rate: gcnii_stack_train(
        adj, he, h0, W, theta, None, None, None, alpha=0.1, reason=False,
        rate=rate, seed=seed, interpret=True)

    o_static = run(0.4)
    o_dyn = run(make_drop_rate(0.4))
    np.testing.assert_allclose(np.asarray(o_dyn), np.asarray(o_static),
                               rtol=1e-6)
    # rate 0 dynamic == rate 0 static (no scale)
    np.testing.assert_allclose(np.asarray(run(make_drop_rate(0.0))),
                               np.asarray(run(0.0)), rtol=1e-6)
    # the scale is live: 0.4-rate all-keep output is 1/0.6 x the 0-rate one
    np.testing.assert_allclose(np.asarray(o_dyn).sum() == 0.0, False)

    # grads flow through the dynamic path and match the static kernel's
    g_static = jax.grad(lambda x: jnp.sum(jnp.sin(gcnii_stack_train(
        adj, x, h0, W, theta, None, None, None, alpha=0.1, reason=False,
        rate=0.4, seed=seed, interpret=True))))(he)
    g_dyn = jax.grad(lambda x: jnp.sum(jnp.sin(gcnii_stack_train(
        adj, x, h0, W, theta, None, None, None, alpha=0.1, reason=False,
        rate=make_drop_rate(0.4), seed=seed, interpret=True))))(he)
    np.testing.assert_allclose(np.asarray(g_dyn), np.asarray(g_static),
                               rtol=1e-5)

    # vmap over stacked rates: slot outputs equal per-rate single calls
    stacked = make_drop_rate([0.0, 0.4])
    outs = jax.vmap(lambda dr: gcnii_stack_train(
        adj, he, h0, W, theta, None, None, None, alpha=0.1, reason=False,
        rate=dr, seed=seed, interpret=True))(stacked)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(run(0.0)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(o_static),
                               rtol=1e-6)


def test_override_is_scoped():
    """Outside the context manager nothing is installed."""
    assert drop_override.get("dropout") is None
    with drop_override.override({"dropout": make_drop_rate(0.3)}):
        assert drop_override.get("dropout") is not None
        assert drop_override.get("other") is None
    assert drop_override.get("dropout") is None
