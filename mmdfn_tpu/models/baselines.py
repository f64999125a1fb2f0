"""Non-graph baseline models: DialogueRNN, GRUModel, LSTMModel, DialogRNNModel.

Reference: ``code/model.py:168-417``.  These are the ``--graph_model`` False
paths trained with MaskedNLLLoss (``run_train_erc.py:463-487,509-510``).

TPU redesign notes:
* The reference's DialogueRNN is a python loop over time calling a cell with a
  *growing* ``g_hist`` tensor (``model.py:271-276``) — quadratic retracing
  poison for XLA.  Here the recurrence is one ``nn.scan`` over a fixed-size
  history buffer with a prefix mask: attention over ``g_hist[:t]`` becomes a
  masked softmax (additive -1e9 on positions >= t), which is mathematically
  identical to softmax over the prefix.
* Party-state updates run all P parties through the shared cell as one fused
  (B*P) batch (reference reshapes the same way, ``model.py:219-221``).
* GRU/LSTM baselines run MatchingAttention('general2') for ALL timesteps in
  one batched (B, L, L) matmul instead of the reference's per-step loop
  (``model.py:345-349``).

All modules are batch-first ``(B, L, ...)`` and return per-utterance log-probs
``(B, L, n_classes)`` (pad positions are garbage; mask downstream).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.attention import MatchingAttention
from mmdfn_tpu.nn.linear import TorchDense
from mmdfn_tpu.nn.rnn import BiRNN, GRUCellStep
from mmdfn_tpu.utils.masking import flip_valid

_NEG = -1e9  # additive mask: exactly softmax-over-prefix semantics


class DialogueRNNStep(nn.Module):
    """One DialogueRNN time step (reference ``DialogueRNNCell``,
    ``model.py:168-240``), written for ``nn.scan``.

    Carry: ``(g_buf (B, L, D_g), t, q (B, P, D_p), e (B, D_e))``.
    Input per step: ``(U_t (B, D_m), qmask_t (B, P))``.
    Output per step: ``(e_t (B, D_e), alpha_t (B, L))``.
    """

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    listener_state: bool = False
    context_attention: str = "simple"
    D_a: int = 100
    dropout: float = 0.5
    deterministic: bool = True

    def _attend(self, g_buf, U_t, t):
        """Attention over the history prefix ``g_buf[:, :t]``."""
        B, L, _ = g_buf.shape
        hist = jnp.arange(L)[None, :] < t                     # (1, L)
        if self.context_attention == "simple":
            # SimpleAttention (model.py:14-29): scalar score per position
            scores = TorchDense(1, use_bias=False,
                                name="att_scalar")(g_buf)[..., 0]
        elif self.context_attention == "general":
            xt = TorchDense(self.D_g, use_bias=False,
                            name="att_transform")(U_t)
            scores = jnp.einsum("bd,bld->bl", xt, g_buf)
        elif self.context_attention == "general2":
            xt = TorchDense(self.D_g, use_bias=True,
                            name="att_transform")(U_t)
            scores = jnp.tanh(jnp.einsum("bd,bld->bl", xt, g_buf))
        elif self.context_attention == "concat":
            mx = jnp.concatenate(
                [g_buf, jnp.broadcast_to(U_t[:, None], (B, L, self.D_m))],
                axis=-1)
            h = jnp.tanh(TorchDense(self.D_a, use_bias=False,
                                    name="att_transform")(mx))
            scores = TorchDense(1, use_bias=False,
                                name="att_vector")(h)[..., 0]
        else:
            raise ValueError(self.context_attention)
        alpha = jax.nn.softmax(jnp.where(hist, scores, _NEG), axis=-1)
        alpha = alpha * hist                                  # t=0: all zero
        c = jnp.einsum("bl,bld->bd", alpha, g_buf)
        return c, alpha

    @nn.compact
    def __call__(self, carry, x):
        g_buf, t, q, e = carry
        U_t, qm_t = x
        B, L, _ = g_buf.shape
        P = qm_t.shape[-1]
        drop = lambda y: nn.Dropout(self.dropout)(
            y, deterministic=self.deterministic)

        qm_idx = jnp.argmax(qm_t, axis=-1)                    # (B,)
        q0_sel = jnp.take_along_axis(
            q, qm_idx[:, None, None], axis=1)[:, 0]           # (B, D_p)

        g_prev = jax.lax.dynamic_slice_in_dim(
            g_buf, jnp.maximum(t - 1, 0), 1, axis=1)[:, 0]
        g_prev = jnp.where(t > 0, g_prev, 0.0)
        g_cell = GRUCellStep(self.D_g, name="g_cell")
        g_ = drop(g_cell(jnp.concatenate([U_t, q0_sel], axis=-1), g_prev))

        c_, alpha = self._attend(g_buf, U_t, t)

        U_c = jnp.concatenate([U_t, c_], axis=-1)             # (B, D_m+D_g)
        U_c_b = jnp.broadcast_to(U_c[:, None], (B, P, U_c.shape[-1]))
        p_cell = GRUCellStep(self.D_p, name="p_cell")
        qs_ = p_cell(U_c_b.reshape(B * P, -1),
                     q.reshape(B * P, self.D_p)).reshape(B, P, self.D_p)
        qs_ = drop(qs_)

        if self.listener_state:
            U_b = jnp.broadcast_to(U_t[:, None], (B, P, self.D_m))
            ss_ = jnp.take_along_axis(qs_, qm_idx[:, None, None], axis=1)
            ss_b = jnp.broadcast_to(ss_, (B, P, self.D_p))
            l_cell = GRUCellStep(self.D_p, name="l_cell")
            ql_ = l_cell(
                jnp.concatenate([U_b, ss_b], axis=-1).reshape(B * P, -1),
                q.reshape(B * P, self.D_p)).reshape(B, P, self.D_p)
            ql_ = drop(ql_)
        else:
            ql_ = q
        qm = qm_t[..., None]
        q_new = ql_ * (1 - qm) + qs_ * qm

        e0 = jnp.where(t > 0, e, 0.0)
        e_sel = jnp.take_along_axis(q_new, qm_idx[:, None, None],
                                    axis=1)[:, 0]
        e_cell = GRUCellStep(self.D_e, name="e_cell")
        e_ = drop(e_cell(e_sel, e0))

        g_buf = jax.lax.dynamic_update_slice_in_dim(
            g_buf, g_[:, None], t, axis=1)
        return (g_buf, t + 1, q_new, e_), (e_, alpha)


class DialogueRNN(nn.Module):
    """Party-state recurrence (reference ``DialogueRNN``, ``model.py:243-278``)
    as a single ``nn.scan`` over time."""

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    listener_state: bool = False
    context_attention: str = "simple"
    D_a: int = 100
    dropout: float = 0.5

    @nn.compact
    def __call__(self, U: jnp.ndarray, qmask: jnp.ndarray,
                 deterministic: bool = True):
        B, L, _ = U.shape
        P = qmask.shape[-1]
        scan = nn.scan(
            DialogueRNNStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1)
        step = scan(self.D_m, self.D_g, self.D_p, self.D_e,
                    self.listener_state, self.context_attention, self.D_a,
                    self.dropout, deterministic, name="cell")
        carry = (jnp.zeros((B, L, self.D_g), U.dtype),
                 jnp.zeros((), jnp.int32),
                 jnp.zeros((B, P, self.D_p), U.dtype),
                 jnp.zeros((B, self.D_e), U.dtype))
        _, (e, alpha) = step(carry, (U, qmask))
        return e, alpha                                       # (B, L, D_e)


class _AttClassifierHead(nn.Module):
    """Shared tail of the GRU/LSTM/DialogRNN baselines
    (``model.py:305-316,345-355,399-416``): per-step MatchingAttention
    ('general2') over the full sequence, ReLU linear, dropout, log-softmax."""

    D_e2: int        # emotions feature width (2*D_e)
    D_h: int
    n_classes: int
    dropout: float = 0.5
    att2: bool = True

    @nn.compact
    def __call__(self, emotions, umask, deterministic: bool = True):
        if self.att2:
            att = MatchingAttention(self.D_e2, self.D_e2,
                                    att_type="general2", name="matchatt")
            att_emotions, alpha = att(emotions, emotions, mask=umask)
            hidden = nn.relu(TorchDense(self.D_h, name="linear")(att_emotions))
        else:
            alpha = None
            hidden = nn.relu(TorchDense(self.D_h, name="linear")(emotions))
        hidden = nn.Dropout(self.dropout)(hidden,
                                          deterministic=deterministic)
        logits = TorchDense(self.n_classes, name="smax_fc")(hidden)
        return jax.nn.log_softmax(logits, axis=-1), alpha


class GRUModel(nn.Module):
    """2-layer bi-GRU baseline (reference ``model.py:281-317``)."""

    D_m: int
    D_e: int
    D_h: int
    n_classes: int = 7
    dropout: float = 0.5
    att2: bool = True

    @nn.compact
    def __call__(self, U, qmask, umask, audio=None, visual=None,
                 deterministic: bool = True):
        emotions = BiRNN(self.D_e, num_layers=2, bidirectional=True,
                         cell="gru", dropout=self.dropout,
                         name="gru")(U, umask, deterministic=deterministic)
        return _AttClassifierHead(
            2 * self.D_e, self.D_h, self.n_classes, self.dropout, self.att2,
            name="head")(emotions, umask, deterministic)[0]


class LSTMModel(nn.Module):
    """2-layer bi-LSTM baseline (reference ``model.py:320-356``)."""

    D_m: int
    D_e: int
    D_h: int
    n_classes: int = 7
    dropout: float = 0.5
    att2: bool = True

    @nn.compact
    def __call__(self, U, qmask, umask, audio=None, visual=None,
                 deterministic: bool = True):
        emotions = BiRNN(self.D_e, num_layers=2, bidirectional=True,
                         cell="lstm", dropout=self.dropout,
                         name="lstm")(U, umask, deterministic=deterministic)
        return _AttClassifierHead(
            2 * self.D_e, self.D_h, self.n_classes, self.dropout, self.att2,
            name="head")(emotions, umask, deterministic)[0]


class DialogRNNModel(nn.Module):
    """Bidirectional DialogueRNN baseline (reference ``model.py:359-417``).

    The backward pass feeds the valid-prefix-reversed sequence (reference
    ``_reverse_seq``, ``model.py:377-389`` == our ``flip_valid``).
    Faithful quirk: ``dropout_rec`` on the emotion streams uses rate
    ``dropout + 0.15`` (``model.py:368``).
    """

    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    D_a: int = 100
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5
    att2: bool = True

    @nn.compact
    def __call__(self, U, qmask, umask, audio=None, visual=None,
                 deterministic: bool = True):
        drop_rec = lambda x: nn.Dropout(min(self.dropout + 0.15, 1.0))(
            x, deterministic=deterministic)
        fwd = DialogueRNN(self.D_m, self.D_g, self.D_p, self.D_e,
                          self.listener_state, self.context_attention,
                          self.D_a, self.dropout_rec, name="dialog_rnn_f")
        emotions_f, _ = fwd(U, qmask, deterministic=deterministic)
        emotions_f = drop_rec(emotions_f)

        rev_U = flip_valid(U, umask)
        rev_qmask = flip_valid(qmask, umask)
        bwd = DialogueRNN(self.D_m, self.D_g, self.D_p, self.D_e,
                          self.listener_state, self.context_attention,
                          self.D_a, self.dropout_rec, name="dialog_rnn_r")
        emotions_b, _ = bwd(rev_U, rev_qmask, deterministic=deterministic)
        emotions_b = drop_rec(flip_valid(emotions_b, umask))

        emotions = jnp.concatenate([emotions_f, emotions_b], axis=-1)
        return _AttClassifierHead(
            2 * self.D_e, self.D_h, self.n_classes, self.dropout, self.att2,
            name="head")(emotions, umask, deterministic)[0]
