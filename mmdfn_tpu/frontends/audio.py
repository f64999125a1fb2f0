"""On-TPU audio frontend: log-mel spectrogram + utterance encoder.

BASELINE.json stretch config: "on-TPU DenseNet vision + log-mel audio
frontends replacing precomputed features".  The reference pipeline consumes
frozen OpenSmile IS10 vectors (1582-d, ``run_train_erc.py:359``) computed
offline on CPU; this module computes trainable utterance embeddings from raw
waveforms on-device.

TPU mapping: framing is a gather-free reshape+slice, the DFT is one matmul
against a precomputed real/imag basis (MXU), the mel projection is another
matmul, and the utterance encoder is mean/std stats pooling over frames + a
projection.  Everything is statically shaped: waveforms arrive padded to
``n_samples`` with a sample-validity implied by utterance masks upstream.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmdfn_tpu.nn.linear import TorchDense


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank (n_fft//2+1, n_mels), HTK-style."""
    fmax = fmax or sample_rate / 2
    freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((len(freqs), n_mels), np.float32)
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(c - lo, 1e-8)
        down = (hi - freqs) / max(hi - c, 1e-8)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT bases (n_fft, n_fft//2+1) with a Hann window folded in."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)
    return ((np.cos(ang) * window[:, None]).astype(np.float32),
            (np.sin(ang) * window[:, None]).astype(np.float32))


def log_mel_spectrogram(wav: jnp.ndarray, *, sample_rate: int = 16000,
                        n_fft: int = 400, hop: int = 160,
                        n_mels: int = 64) -> jnp.ndarray:
    """(..., n_samples) -> (..., n_frames, n_mels) log-mel features.

    The STFT is framed matmuls against a windowed DFT basis — no FFT
    primitive needed, and XLA tiles the two matmuls straight onto the MXU.
    """
    *lead, S = wav.shape
    n_frames = 1 + (S - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])                      # (F, n_fft)
    frames = wav.reshape(-1, S)[:, idx]                      # (N, F, n_fft)
    cos_b, sin_b = (jnp.asarray(b) for b in _dft_basis(n_fft))
    re = frames @ cos_b
    im = frames @ sin_b
    power = re * re + im * im                                # (N, F, n_fft/2+1)
    mel = power @ jnp.asarray(mel_filterbank(n_mels, n_fft, sample_rate))
    out = jnp.log(mel + 1e-6)
    return out.reshape(*lead, n_frames, n_mels)


class LogMelFrontend(nn.Module):
    """Raw waveform -> utterance embedding.

    (B, L, n_samples) -> (B, L, out_dim): log-mel, a small frame conv stack,
    then mean+std statistics pooling over frames (the on-TPU stand-in for
    OpenSmile's functionals) and a linear head.
    """

    out_dim: int = 300
    n_mels: int = 64
    n_fft: int = 400
    hop: int = 160
    sample_rate: int = 16000
    channels: int = 128

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L, S = wav.shape
        mel = log_mel_spectrogram(
            wav.reshape(B * L, S), sample_rate=self.sample_rate,
            n_fft=self.n_fft, hop=self.hop, n_mels=self.n_mels)
        h = nn.Conv(self.channels, (5,), strides=(2,), name="conv1")(mel)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3,), strides=(2,), name="conv2")(h)
        h = nn.relu(h)
        mean = jnp.mean(h, axis=1)
        std = jnp.sqrt(jnp.maximum(jnp.var(h, axis=1), 1e-8))
        stats = jnp.concatenate([mean, std], axis=-1)
        out = TorchDense(self.out_dim, name="proj")(stats)
        return out.reshape(B, L, self.out_dim)
