"""Parity + autodiff tests for the fused GCNII TRAIN kernel
(ops/pallas_gcnii_train.py), interpreter mode on CPU.

The oracle is the same bf16-cast math the production scan computes
(gcn_compute_dtype='bfloat16').  Gradients are compared at bf16-cotangent
tolerance (the kernel hands back bf16 adjacency/weight cotangents by
design).  Dropout (in-kernel hardware PRNG) is checked for determinism,
seed-sensitivity, drop-rate statistics, and VJP correctness via finite
differences with a FIXED seed (masks identical across evals).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.ops.pallas_gcnii_train import gcnii_stack_train

ALPHA = 0.2


def _inputs(rng, B, N, H, NL):
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    adj = f32(B, N, N) / N
    adj = (adj + jnp.swapaxes(adj, 1, 2)) / 2
    he = jnp.abs(f32(B, N, H))
    h0 = jnp.abs(f32(B, N, H))
    W = f32(NL, 2 * H, H) * 0.3
    theta = jnp.log(0.5 / jnp.arange(1, NL + 1) + 1.0)
    lih, lhh, lb = f32(H, 4 * H) * 0.3, f32(H, 4 * H) * 0.3, f32(4 * H) * 0.3
    return adj, he, h0, W, theta, lih, lhh, lb


def _xla_ref(adj, he, h0, W, theta, lih, lhh, lb, reason, alpha=ALPHA):
    """The bf16-matmul/f32-elementwise math the kernel implements."""
    bf = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)
    h, lh, lc = he, jnp.zeros_like(he), jnp.zeros_like(he)
    adjb, h0b = bf(adj), bf(h0)
    NL, H2, H = W.shape
    for l in range(NL):
        q = h
        if reason:
            g = h @ lih + lh @ lhh + lb
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            i, f, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f),
                       jax.nn.sigmoid(o))
            gg = jnp.tanh(gg)
            lc = f * lc + i * gg
            lh = o * jnp.tanh(lc)
            h1 = lh
        else:
            h1 = h
        hi = jnp.einsum("bnm,bmh->bnh", adjb, bf(h1))
        support = (jnp.einsum("bnh,hk->bnk", bf(hi), bf(W[l, :H]))
                   + jnp.einsum("bnh,hk->bnk", h0b, bf(W[l, H:])))
        r = (1 - alpha) * hi + alpha * h0b
        h = jnp.maximum(theta[l] * support + (1 - theta[l]) * r, 0.0)
        if reason:
            h = h + q
    return h


@pytest.mark.parametrize("fuse", [False, True])
@pytest.mark.parametrize("reason", [True, False])
def test_forward_and_grads_match_xla(rng, reason, fuse):
    B, N, H, NL = 2, 20, 12, 3
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)

    def run_kernel(args):
        adj, he, h0, W, lih, lhh, lb = args
        return gcnii_stack_train(adj, he, h0, W, theta, lih, lhh, lb,
                                 alpha=ALPHA, reason=reason, rate=0.0,
                                 seed=0, interpret=True, fuse_dots=fuse)

    def run_ref(args):
        adj, he, h0, W, lih, lhh, lb = args
        return _xla_ref(adj, he, h0, W, theta, lih, lhh, lb, reason)

    args = (adj, he, h0, W, lih, lhh, lb)
    out_k, out_r = run_kernel(args), run_ref(args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-5)

    lk = lambda a: jnp.sum(jnp.sin(run_kernel(a)))
    lr = lambda a: jnp.sum(jnp.sin(run_ref(a)))
    gk, gr = jax.grad(lk)(args), jax.grad(lr)(args)
    names = ["adj", "he", "h0", "W", "lih", "lhh", "lb"]
    for a, b, name in zip(gk, gr, names):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        # every grad carries bf16 noise by design: adj/h0/W cotangents are
        # bf16, and the per-layer residual carries (h/lh/lc) are stored
        # bf16 — measured max rel diff ~6e-3, tolerance leaves ~3x slack
        tol = 2e-2 * scale
        assert np.abs(a32 - b32).max() < tol, (
            f"grad {name}: {np.abs(a32 - b32).max():.3e} vs tol {tol:.3e}")


@pytest.mark.parametrize("fuse", [False, True])
def test_flagship_depth_16_layer_blocks(rng, fuse):
    """16 layers exercises the K=8 layer-block grid (the flagship's block
    size; the small-NL tests above run K<=2) including the backward's
    reversed block index maps, at tiny N/H to keep the interpreter fast."""
    B, N, H, NL = 1, 12, 8, 16
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)
    W = W * 0.5  # keep 16 chained layers numerically tame

    def run(he_, kernel):
        if kernel:
            return gcnii_stack_train(adj, he_, h0, W, theta, lih, lhh, lb,
                                     alpha=ALPHA, reason=True, rate=0.0,
                                     seed=0, interpret=True, fuse_dots=fuse)
        return _xla_ref(adj, he_, h0, W, theta, lih, lhh, lb, True)

    out_k, out_r = run(he, True), run(he, False)
    scale = max(float(jnp.abs(out_r).max()), 1.0)
    assert float(jnp.abs(out_k - out_r).max()) < 1e-3 * scale

    gk = jax.grad(lambda x: jnp.sum(jnp.sin(run(x, True))))(he)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(run(x, False))))(he)
    gscale = max(float(jnp.abs(gr).max()), 1e-3)
    assert float(jnp.abs(gk - gr).max()) < 2e-2 * gscale


def test_deepest_published_depth_64_layers(rng):
    """64 layers — MELD's deepest published config, kernel-eligible since
    the Mosaic VMEM cap was raised for the backward's weight-grad
    accumulators (nn/gcn.py gate nlayers<=64).  Tiny N/H keeps the
    interpreter fast; checks fwd + input-grad parity vs the XLA ref."""
    B, N, H, NL = 1, 10, 8, 64
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)
    W = W * 0.5

    def run(he_, kernel):
        if kernel:
            return gcnii_stack_train(adj, he_, h0, W, theta, lih, lhh, lb,
                                     alpha=ALPHA, reason=True, rate=0.0,
                                     seed=0, interpret=True)
        return _xla_ref(adj, he_, h0, W, theta, lih, lhh, lb, True)

    out_k, out_r = run(he, True), run(he, False)
    scale = max(float(jnp.abs(out_r).max()), 1.0)
    assert float(jnp.abs(out_k - out_r).max()) < 2e-3 * scale

    gk = jax.grad(lambda x: jnp.sum(jnp.sin(run(x, True))))(he)
    gr = jax.grad(lambda x: jnp.sum(jnp.sin(run(x, False))))(he)
    gscale = max(float(jnp.abs(gr).max()), 1e-3)
    assert float(jnp.abs(gk - gr).max()) < 3e-2 * gscale


@pytest.mark.parametrize("fuse", [False, True])
@pytest.mark.parametrize("bk", [2, 4])
def test_bwd_batch_block_matches_unblocked(rng, bk, fuse):
    """bwd_batch_block=Bk batches Bk batch elements per backward grid step
    (shared-weight grad dots contract Bk x the rows in one dot); grads must
    match the per-b backward up to f32 dot-summation-order noise.  Bk=3
    does not divide B=4, exercising the silent fall-back to 1."""
    B, N, H, NL = 4, 20, 12, 4
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)
    args = (adj, he, h0, W, lih, lhh, lb)

    def loss(a, bwd_bk):
        adj_, he_, h0_, W_, lih_, lhh_, lb_ = a
        return jnp.sum(jnp.sin(gcnii_stack_train(
            adj_, he_, h0_, W_, theta, lih_, lhh_, lb_,
            alpha=ALPHA, reason=True, rate=0.0, seed=0, interpret=True,
            fuse_dots=fuse, bwd_batch_block=bwd_bk)))

    # forward identical (bwd_bk only reshapes the backward)
    np.testing.assert_array_equal(
        np.asarray(loss(args, None)), np.asarray(loss(args, bk)))

    g1 = jax.grad(lambda a: loss(a, None))(args)
    gb = jax.grad(lambda a: loss(a, bk))(args)
    g3 = jax.grad(lambda a: loss(a, 3))(args)      # non-divisor fall-back
    names = ["adj", "he", "h0", "W", "lih", "lhh", "lb"]
    for a, b, c, name in zip(g1, gb, g3, names):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a32).max(), 1e-3)
        assert np.abs(a32 - b32).max() < 1e-4 * scale, name
        np.testing.assert_array_equal(a32, np.asarray(c, np.float32),
                                      err_msg=name)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="the CPU Pallas interpreter stubs the TPU PRNG "
                           "with zeros (all-keep); dropout statistics are "
                           "only meaningful on hardware — validated by "
                           "benchmarks/bench_gcnii_train_pallas.py on TPU")
def test_dropout_semantics(rng):
    B, N, H, NL = 2, 24, 12, 2
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)
    # interpret=False: this test only runs on hardware (skipif above), and
    # interpret=True would route through the TPU interpreter whose PRNG
    # stub returns zeros (all-keep) even on a TPU backend.
    run = lambda seed, rate: gcnii_stack_train(
        adj, he, h0, W, theta, lih, lhh, lb, alpha=ALPHA, reason=True,
        rate=rate, seed=seed, interpret=False)

    a1, a2, b1 = run(7, 0.5), run(7, 0.5), run(8, 0.5)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(a1) - np.asarray(b1)).max() > 1e-6

    # drop-rate statistics on the first layer's mask: with 2 layers the
    # final output mixes masks, so measure via a single-layer run
    one = gcnii_stack_train(adj, he, h0, W[:1], theta[:1], lih, lhh, lb,
                            alpha=ALPHA, reason=False, rate=0.5, seed=3,
                            interpret=False)
    ref = gcnii_stack_train(adj, he, h0, W[:1], theta[:1], lih, lhh, lb,
                            alpha=ALPHA, reason=False, rate=0.0, seed=3,
                            interpret=False)
    # positions where ref is strictly positive can be zeroed only by the
    # mask; their zero-fraction estimates the drop rate
    pos = np.asarray(ref) > 1e-6
    dropped = (np.asarray(one) == 0.0) & pos
    frac = dropped.sum() / max(pos.sum(), 1)
    assert 0.4 < frac < 0.6, f"drop fraction {frac} not ~0.5"


@pytest.mark.parametrize("fuse", [False, True])
def test_dropout_vjp_finite_difference(rng, fuse):
    """With a FIXED seed the masks are identical across evaluations, so the
    custom VJP must match central finite differences through the dropout.
    (On CPU the interpreter PRNG keeps everything, so this exercises the
    1/keep scale path; the mask path is hardware-validated.)"""
    B, N, H, NL = 1, 16, 8, 2
    adj, he, h0, W, theta, lih, lhh, lb = _inputs(rng, B, N, H, NL)

    def loss(he_):
        out = gcnii_stack_train(adj, he_, h0, W, theta, lih, lhh, lb,
                                alpha=ALPHA, reason=True, rate=0.4, seed=11,
                                interpret=True, fuse_dots=fuse)
        return jnp.sum(jnp.sin(out))

    g = jax.grad(loss)(he)
    d = jnp.asarray(rng.standard_normal(he.shape), jnp.float32)
    eps = 1e-3
    fd = (float(loss(he + eps * d)) - float(loss(he - eps * d))) / (2 * eps)
    an = float(jnp.vdot(g, d))
    assert abs(fd - an) < 2e-2 * max(abs(fd), 1.0), (fd, an)


@pytest.mark.parametrize("backend,bwd_block", [
    ("pallas", None), ("pallas_fused", None), ("pallas", 2)])
def test_flagship_model_gcn_backend_parity(rng, backend, bwd_block):
    """DialogueGNN with gcn_backend='pallas' (dropout off) matches the
    default scan end-to-end — forward log-probs and parameter gradients;
    the gcn_bwd_block=2 case drives the batch-blocked backward through
    the full model path (config -> GCNIIStack -> kernel)."""
    from mmdfn_tpu.models import DialogueGNN

    B, L = 2, 5
    lengths = np.array([5, 3])
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]
    feat = lambda D: (rng.standard_normal((B, L, D)).astype(np.float32)
                      * umask[..., None])
    text, audio, visual = feat(100), feat(1582), feat(342)
    label = rng.integers(0, 6, size=(B, L))

    kw = dict(base_model="LSTM", D_m=100, D_m_a=1582, D_m_v=342,
              n_speakers=2, n_classes=6, dropout=0.0, graph_type="GDF",
              reason_flag=True, deep_gcn_nlayers=2, use_crn_speaker=True,
              speaker_weights="3-0-1", alpha=0.2, lamda=0.5)
    ref_model = DialogueGNN(**kw)
    pal_model = DialogueGNN(**kw, gcn_backend=backend,
                            gcn_bwd_block=bwd_block)

    js = lambda a: jnp.asarray(a)
    variables = ref_model.init(jax.random.PRNGKey(0), js(text), js(qmask),
                               js(umask), js(audio), js(visual),
                               deterministic=True)

    def nll(model, params):
        lp = model.apply({"params": params}, js(text), js(qmask), js(umask),
                         js(audio), js(visual), deterministic=True)
        picked = jnp.take_along_axis(lp, js(label)[..., None],
                                     axis=-1)[..., 0]
        return -jnp.sum(picked * js(umask)) / jnp.sum(js(umask))

    ref_loss, ref_grad = jax.value_and_grad(
        lambda p: nll(ref_model, p))(variables["params"])
    pal_loss, pal_grad = jax.value_and_grad(
        lambda p: nll(pal_model, p))(variables["params"])

    # forward: the kernel's bf16 matmuls vs the scan's f32 — bf16-sized gap
    np.testing.assert_allclose(float(pal_loss), float(ref_loss), atol=2e-2)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(pal_grad),
            jax.tree_util.tree_leaves_with_path(ref_grad)):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(b32).max()
        # relative bound for healthy grads + an absolute floor: bf16
        # rounding inside the kernel puts ~1e-3-size absolute noise on
        # grads whose true magnitude is near zero (e.g. deep conv_w)
        tol = max(0.08 * scale, 5e-3)
        assert np.abs(a32 - b32).max() < tol, (
            f"{jax.tree_util.keystr(pa)}: "
            f"{np.abs(a32 - b32).max():.3e} vs tol {tol:.3e}")


def test_vmap_over_configs_matches_sequential(rng):
    """jax.vmap of the kernel over a stacked-config axis (grad INSIDE vmap,
    the VmapSweep dataflow) equals per-config sequential runs — pins the
    rank-2 seed operand that makes the kernel's vmap lowering legal (a
    rank-1 (K, 1) SMEM block fails the Mosaic block-shape rule on TPU)."""
    K, B, N, H, NL = 2, 2, 24, 20, 4
    adj, he, h0, _, _, _, _, _ = _inputs(rng, B, N, H, NL)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    W = f32(K, NL, 2 * H, H) * 0.3
    theta = jnp.stack([jnp.log(0.5 / jnp.arange(1, NL + 1) + 1.0)] * K)
    lih, lhh = f32(K, H, 4 * H) * 0.3, f32(K, H, 4 * H) * 0.3
    lb = f32(K, 4 * H) * 0.3
    seeds = jnp.arange(K, dtype=jnp.int32)

    def one(w, t, ih, hh, b_, sd, x):
        return gcnii_stack_train(adj, x, h0, w, t, ih, hh, b_, alpha=ALPHA,
                                 reason=True, rate=0.0, seed=sd,
                                 interpret=True, bwd_batch_block=2)

    def g(w, t, ih, hh, b_, sd, x):
        return jax.grad(lambda z: jnp.sum(jnp.sin(
            one(w, t, ih, hh, b_, sd, z))))(x)

    axes = (0, 0, 0, 0, 0, 0, None)
    out_v = jax.vmap(one, in_axes=axes)(W, theta, lih, lhh, lb, seeds, he)
    g_v = jax.vmap(g, in_axes=axes)(W, theta, lih, lhh, lb, seeds, he)
    for k in range(K):
        o = one(W[k], theta[k], lih[k], lhh[k], lb[k], seeds[k], he)
        gr = g(W[k], theta[k], lih[k], lhh[k], lb[k], seeds[k], he)
        assert float(jnp.abs(out_v[k] - o).max()) < 1e-5
        assert float(jnp.abs(g_v[k] - gr).max()) < 1e-5
