"""DailyDialogue training path: token-id batches through the full Trainer.

The reference ships the DailyDialogue loader (``dataloader.py:71-101``) and
the ``DialogueGCN_DailyModel`` (``model.py:1446-1545``) but never connects
them to its epoch driver — ``run_train_erc.py`` only dispatches IEMOCAP/MELD.
This module completes the family end-to-end: the same jitted-step engine,
bucketed static batching, early stopping, checkpoint/resume and metrics as
:class:`~mmdfn_tpu.train.trainer.Trainer`, specialized to token-id inputs
(``TokenBatch``) and the trainable TextCNN frontend.

TPU notes: token batches are (B, L, W) int32 with W fixed epoch-wide
(``TokenBucketBatcher``), so the embedding gather + TextCNN convs compile
once per length bucket; everything else in the step graph is identical to
the multimodal path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmdfn_tpu.config import (D_A, D_E, D_G, D_H, D_P, GRAPH_H, MAX_SEQ_LEN,
                              ExperimentConfig)
from mmdfn_tpu.data.batching import TokenBucketBatcher
from mmdfn_tpu.train.optim import torch_adam
from mmdfn_tpu.train.trainer import Trainer, TrainState


class DailyTrainer(Trainer):
    """Trainer over ``TokenDialogue``/``TokenBatch`` (DailyDialogue ERC)."""

    @staticmethod
    def _build_model(cfg: ExperimentConfig, mesh=None):
        # mesh accepted for base-class signature parity; the Daily model has
        # no node-sharded (TP) path — DP sharding is handled by the Trainer
        from mmdfn_tpu.models.daily import DialogueGCNDailyModel
        info = cfg.info
        return DialogueGCNDailyModel(
            base_model=cfg.base_model, D_m=cfg.cnn_output_size,
            D_g=D_G, D_p=D_P, D_e=D_E, D_h=D_H, D_a=D_A,
            graph_hidden_size=GRAPH_H, n_speakers=info["n_speakers"],
            max_seq_len=MAX_SEQ_LEN, window_past=cfg.windowp,
            window_future=cfg.windowf, vocab_size=cfg.vocab_size,
            embedding_dim=cfg.embedding_dim,
            cnn_output_size=cfg.cnn_output_size, cnn_filters=cfg.cnn_filters,
            n_classes=info["n_classes"], listener_state=cfg.active_listener,
            context_attention=cfg.attention, dropout_rec=cfg.rec_dropout,
            dropout=cfg.dropout, nodal_attention=cfg.nodal_attention)

    def _apply_model(self, params, batch, deterministic, rngs=None,
                     **apply_kw):
        return self.model.apply(
            {"params": params}, batch["tokens"], batch["qmask"],
            batch["umask"], deterministic=deterministic, rngs=rngs,
            **apply_kw)

    def _init_variables(self, rng, example):
        return self.model.init(rng, example["tokens"], example["qmask"],
                               example["umask"], deterministic=True)

    def _example_inputs(self) -> Dict[str, jnp.ndarray]:
        cfg, info = self.cfg, self.cfg.info
        B, L = 2, 8
        return dict(
            tokens=jnp.zeros((B, L, cfg.max_words), jnp.int32),
            qmask=jnp.zeros((B, L, info["n_speakers"])),
            umask=jnp.ones((B, L)),
            label=jnp.zeros((B, L), jnp.int32))

    def _prepare(self, batch) -> Dict[str, jnp.ndarray]:
        return dict(tokens=jnp.asarray(batch.tokens),
                    qmask=jnp.asarray(batch.qmask),
                    umask=jnp.asarray(batch.umask),
                    label=jnp.asarray(batch.label))

    def _make_batcher(self, dialogues, shuffle: bool = False):
        cfg = self.cfg
        return TokenBucketBatcher(
            dialogues, cfg.batch_size, cfg.max_words, cfg.buckets,
            shuffle=shuffle, seed=cfg.seed,
            sort_by_length=cfg.sort_batches_by_length if shuffle else False,
            n_speakers=cfg.info["n_speakers"])

    # ------------------------------------------------------------------
    def init_pretrained_embeddings(self, state: TrainState,
                                   vectors: np.ndarray,
                                   freeze: bool = True) -> TrainState:
        """Inject pretrained word vectors into the TextCNN embedding table.

        Functional counterpart of the reference's
        ``CNNFeatureExtractor.init_pretrained_embeddings_from_numpy``
        (``model.py:1421-1423``), which overwrites the embedding weight and
        sets ``requires_grad=False``.  Here the table is replaced in the
        params pytree and, when ``freeze`` is set, the optimizer is rebuilt
        as an ``optax.multi_transform`` that zeroes that leaf's updates —
        the jitted steps are re-derived and the optimizer state is
        re-initialized (call BEFORE training, as the reference does).
        """
        cfg = self.cfg
        vectors = np.asarray(vectors, np.float32)
        expect = (cfg.vocab_size, cfg.embedding_dim)
        if vectors.shape != expect:
            raise ValueError(f"pretrained embeddings shape {vectors.shape} "
                             f"!= (vocab_size, embedding_dim) {expect}")
        emb_path = ("cnn_feat_extractor", "embedding")
        params = jax.tree_util.tree_map(lambda x: x, state.params)
        sub = dict(params)
        inner = dict(sub[emb_path[0]])
        inner[emb_path[1]] = jnp.asarray(vectors)
        sub[emb_path[0]] = inner
        params = sub
        if freeze:
            def label(path, _):
                keys = tuple(getattr(k, "key", k) for k in path)
                return "frozen" if keys[:2] == emb_path else "train"
            labels = jax.tree_util.tree_map_with_path(label, params)
            self.tx = optax.multi_transform(
                {"train": torch_adam(cfg.lr, weight_decay=cfg.l2),
                 "frozen": optax.set_to_zero()}, labels)
            self._train_step, self._eval_step = self._build_steps()
        state = TrainState(params=params, opt_state=self.tx.init(params),
                           step=state.step)
        if self.mesh is not None:
            from mmdfn_tpu.runtime.mesh import replicate
            state = replicate(self.mesh, state)
        return state
