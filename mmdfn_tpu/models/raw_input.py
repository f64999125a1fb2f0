"""End-to-end raw-input ERC model: on-TPU frontends + DialogueGNN.

The BASELINE.json stretch config replaces the reference's precomputed
utterance features (offline OpenSmile / DenseNet runs) with trainable
on-device extractors: raw waveforms -> log-mel encoder, face crops ->
DenseNet, precomputed text features pass through.  The fused features feed
the unchanged DialogueGNN orchestrator, so every graph type / fusion path
works on raw inputs and the whole pipeline trains end-to-end in one jitted
step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from mmdfn_tpu.frontends.audio import LogMelFrontend
from mmdfn_tpu.frontends.vision import DenseNetFrontend
from mmdfn_tpu.models.dialogue_gnn import DialogueGNN


class RawInputDialogueGNN(nn.Module):
    """(waveforms, face frames, text features) -> per-utterance log-probs."""

    model: DialogueGNN
    audio_out_dim: int = 300
    visual_out_dim: int = 342
    n_mels: int = 64
    n_fft: int = 400
    hop: int = 160
    densenet_growth: int = 12

    @nn.compact
    def __call__(self, text: jnp.ndarray, qmask: jnp.ndarray,
                 umask: jnp.ndarray, waveforms: jnp.ndarray,
                 frames: jnp.ndarray, deterministic: bool = True):
        """waveforms: (B, L, n_samples); frames: (B, L, H, W, C)."""
        audio = LogMelFrontend(
            out_dim=self.audio_out_dim, n_mels=self.n_mels, n_fft=self.n_fft,
            hop=self.hop, name="audio_frontend")(waveforms, deterministic)
        visual = DenseNetFrontend(
            out_dim=self.visual_out_dim, growth=self.densenet_growth,
            name="visual_frontend")(frames, deterministic)
        um = umask[..., None]
        return self.model(text, qmask, umask, audio * um, visual * um,
                          deterministic=deterministic)
