"""Raw-input end-to-end model: frontends + graph fusion train together."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mmdfn_tpu.losses import focal_loss
from mmdfn_tpu.models.dialogue_gnn import DialogueGNN
from mmdfn_tpu.models.raw_input import RawInputDialogueGNN


def test_raw_input_end_to_end_trains(rng):
    B, L, S, HW = 2, 4, 1600, 16
    model = RawInputDialogueGNN(
        model=DialogueGNN(
            base_model="LSTM", D_m=100, D_m_a=300, D_m_v=342, n_speakers=2,
            n_classes=6, dropout=0.1, graph_type="GDF", reason_flag=True,
            deep_gcn_nlayers=2),
        audio_out_dim=300, visual_out_dim=342, n_fft=256, hop=128, n_mels=24,
        densenet_growth=8)

    umask = np.ones((B, L), np.float32)
    umask[1, 3:] = 0
    text = (rng.standard_normal((B, L, 100)) * umask[..., None]).astype(np.float32)
    wav = (rng.standard_normal((B, L, S)) * umask[..., None]).astype(np.float32)
    frames = rng.standard_normal((B, L, HW, HW, 3)).astype(np.float32)
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None], spk] = 1
    qmask *= umask[..., None]
    label = (rng.integers(0, 6, size=(B, L)) * umask).astype(np.int32)

    args = (jnp.array(text), jnp.array(qmask), jnp.array(umask),
            jnp.array(wav), jnp.array(frames))
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    umask_j, label_j = jnp.array(umask), jnp.array(label)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logp = model.apply({"params": p}, *args)
            return focal_loss(logp, label_j, umask_j, gamma=0.5)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the frontends must receive gradients (end-to-end, not frozen)
    g = jax.grad(lambda p: focal_loss(
        model.apply({"params": p}, *args), label_j, umask_j, gamma=0.5))(params)
    for front in ("audio_frontend", "visual_frontend"):
        leaves = jax.tree_util.tree_leaves(g[front])
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves), front
