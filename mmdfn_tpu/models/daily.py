"""DailyDialogue model family: trainable TextCNN frontend + relation graph.

Reference: ``CNNFeatureExtractor`` (``code/model.py:1410-1443``),
``DialogueGCN_DailyModel`` (``code/model.py:1446-1545``), and the
``TextCNN`` block (``code/model_GCN.py:192-221``, used when
``use_bert_seq=True`` — hard-coded off upstream but part of the API surface).

The reference is not wired into its CLI (the DailyDialogue loader exists but
``run_train_erc.py`` never selects it); we ship it as a library component
with the same constructor surface, batch-first ``(B, L, ...)``.

TextCNN convolutions map to ``nn.Conv`` over the word axis (XLA lowers these
to MXU-friendly implicit GEMMs); torch's ``Conv2d(1, C, (K, D))`` over
``(B, 1, L, D)`` is exactly a width-D 1-D conv over the length axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdfn_tpu.graph.relation import relation_type_ids, window_edge_mask
from mmdfn_tpu.models.baselines import DialogueRNN
from mmdfn_tpu.models.relation_net import GraphNetwork
from mmdfn_tpu.nn.attention import MaskedEdgeAttention
from mmdfn_tpu.nn.linear import TorchDense
from mmdfn_tpu.nn.rnn import BiRNN
from mmdfn_tpu.utils import torch_init
from mmdfn_tpu.utils.masking import flip_valid


class CNNFeatureExtractor(nn.Module):
    """Token-id TextCNN frontend (``model.py:1410-1443``).

    tokens (B, L, W) int32 -> (B, L, output_size), masked by umask.
    Pretrained (frozen) embeddings can be injected by overwriting
    ``params['embedding']`` after init (the reference's
    ``init_pretrained_embeddings_from_numpy``).
    """

    vocab_size: int
    embedding_dim: int = 300
    output_size: int = 100
    filters: int = 50
    kernel_sizes: Sequence[int] = (3, 4, 5)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, umask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L, W = tokens.shape
        emb_table = self.param("embedding", torch_init.embedding_normal,
                               (self.vocab_size, self.embedding_dim))
        emb = emb_table[tokens.reshape(B * L, W)]          # (BL, W, E)
        pooled = []
        for K in self.kernel_sizes:
            c = nn.Conv(self.filters, kernel_size=(K,), padding="VALID",
                        kernel_init=torch_init.conv_kernel,
                        bias_init=torch_init.linear_bias(K * self.embedding_dim),
                        name=f"conv{K}")(emb)               # (BL, W-K+1, F)
            pooled.append(jnp.max(nn.relu(c), axis=1))      # (BL, F)
        cat = jnp.concatenate(pooled, axis=-1)
        cat = nn.Dropout(self.dropout)(cat, deterministic=deterministic)
        feat = nn.relu(TorchDense(self.output_size, name="fc")(cat))
        return feat.reshape(B, L, -1) * umask[..., None]


class TextCNN(nn.Module):
    """Frame-sequence TextCNN (``model_GCN.py:192-221``): pools a (B, L, D)
    frame sequence to one (B, emb_size) vector via 3 parallel full-width
    convolutions + global max pooling."""

    input_dim: int
    emb_size: int = 128
    out_channels: int = 128
    kernel_heights: Sequence[int] = (3, 4, 5)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, frame_x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        outs = []
        for K in self.kernel_heights:
            c = nn.Conv(self.out_channels, kernel_size=(K,), padding="VALID",
                        kernel_init=torch_init.conv_kernel,
                        bias_init=torch_init.linear_bias(K * self.input_dim),
                        name=f"conv_k{K}")(frame_x)         # (B, L-K+1, C)
            outs.append(jnp.max(nn.relu(c), axis=1))
        cat = jnp.concatenate(outs, axis=-1)
        cat = nn.Dropout(self.dropout)(cat, deterministic=deterministic)
        return nn.relu(TorchDense(self.emb_size, name="embd")(cat))


class DialogueGCNDailyModel(nn.Module):
    """DailyDialogue ERC model (``model.py:1446-1545``): CNN text frontend,
    DialogRNN/LSTM/GRU/None context encoder, windowed relation graph net."""

    base_model: str
    D_m: int
    D_g: int
    D_p: int
    D_e: int
    D_h: int
    D_a: int
    graph_hidden_size: int
    n_speakers: int
    max_seq_len: int
    window_past: int
    window_future: int
    vocab_size: int
    embedding_dim: int = 100
    cnn_output_size: int = 100
    cnn_filters: int = 50
    cnn_kernel_sizes: Sequence[int] = (3, 4, 5)
    cnn_dropout: float = 0.5
    n_classes: int = 7
    listener_state: bool = False
    context_attention: str = "simple"
    dropout_rec: float = 0.5
    dropout: float = 0.5
    nodal_attention: bool = True
    avec: bool = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, qmask: jnp.ndarray,
                 umask: jnp.ndarray, deterministic: bool = True):
        U = CNNFeatureExtractor(
            self.vocab_size, self.embedding_dim, self.cnn_output_size,
            self.cnn_filters, self.cnn_kernel_sizes, self.cnn_dropout,
            name="cnn_feat_extractor")(tokens, umask, deterministic)

        if self.base_model == "DialogRNN":
            fwd = DialogueRNN(self.D_m, self.D_g, self.D_p, self.D_e,
                              self.listener_state, self.context_attention,
                              self.D_a, self.dropout_rec,
                              name="dialog_rnn_f")
            emotions_f, _ = fwd(U, qmask, deterministic=deterministic)
            if self.avec:
                emotions = emotions_f
            else:
                bwd = DialogueRNN(self.D_m, self.D_g, self.D_p, self.D_e,
                                  self.listener_state, self.context_attention,
                                  self.D_a, self.dropout_rec,
                                  name="dialog_rnn_r")
                emotions_b, _ = bwd(flip_valid(U, umask),
                                    flip_valid(qmask, umask),
                                    deterministic=deterministic)
                emotions = jnp.concatenate(
                    [emotions_f, flip_valid(emotions_b, umask)], axis=-1)
        elif self.base_model == "LSTM":
            emotions = BiRNN(self.D_e, 2, True, "lstm", self.dropout,
                             name="lstm")(U, umask, deterministic)
        elif self.base_model == "GRU":
            emotions = BiRNN(self.D_e, 2, True, "gru", self.dropout,
                             name="gru")(U, umask, deterministic)
        elif self.base_model == "None":
            emotions = TorchDense(2 * self.D_e, name="base_linear")(U)
        else:
            raise NotImplementedError(self.base_model)

        edge_mask = window_edge_mask(umask, self.window_past,
                                     self.window_future)
        rel_ids = relation_type_ids(qmask)
        edge_w = MaskedEdgeAttention(self.max_seq_len,
                                     name="att_model")(emotions, edge_mask)
        net = GraphNetwork(
            2 * self.D_e, self.n_classes, 2 * self.n_speakers ** 2,
            hidden_size=self.graph_hidden_size, dropout=self.dropout,
            use_GCN=False, return_feature=False, name="graph_net")
        return net(emotions, edge_w, rel_ids, edge_mask, qmask, umask,
                   self.nodal_attention, self.avec, deterministic)
