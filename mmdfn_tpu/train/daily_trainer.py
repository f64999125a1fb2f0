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

import jax.numpy as jnp

from mmdfn_tpu.config import (D_A, D_E, D_G, D_H, D_P, GRAPH_H, MAX_SEQ_LEN,
                              ExperimentConfig)
from mmdfn_tpu.data.batching import TokenBucketBatcher
from mmdfn_tpu.train.trainer import Trainer


class DailyTrainer(Trainer):
    """Trainer over ``TokenDialogue``/``TokenBatch`` (DailyDialogue ERC)."""

    @staticmethod
    def _build_model(cfg: ExperimentConfig):
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
