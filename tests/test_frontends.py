"""On-TPU feature frontends: log-mel correctness, DenseNet shapes/training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.frontends import (DenseNetFrontend, LogMelFrontend,
                                 log_mel_spectrogram)
from mmdfn_tpu.frontends.audio import mel_filterbank


def test_log_mel_matches_numpy_stft(rng):
    """Framed-matmul STFT vs a straightforward numpy STFT oracle."""
    sr, n_fft, hop, n_mels = 16000, 256, 128, 24
    wav = rng.standard_normal(2048).astype(np.float32)

    ours = np.asarray(log_mel_spectrogram(
        jnp.asarray(wav)[None], sample_rate=sr, n_fft=n_fft, hop=hop,
        n_mels=n_mels))[0]

    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(wav) - n_fft) // hop
    spec = np.empty((n_frames, n_fft // 2 + 1), np.float32)
    for t in range(n_frames):
        fr = wav[t * hop: t * hop + n_fft] * window
        spec[t] = np.abs(np.fft.rfft(fr)) ** 2
    mel = spec @ mel_filterbank(n_mels, n_fft, sr)
    expected = np.log(mel + 1e-6)
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-3)


def test_log_mel_sine_peak():
    """A pure tone's energy must land in the right mel bin region."""
    sr, n_fft, hop, n_mels = 16000, 400, 160, 64
    t = np.arange(4000) / sr
    wav = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    mel = np.asarray(log_mel_spectrogram(
        jnp.asarray(wav)[None], sample_rate=sr, n_fft=n_fft, hop=hop,
        n_mels=n_mels))[0]
    peak_bin = int(np.argmax(mel.mean(axis=0)))
    # 1 kHz sits around mel bin ~25/64 for 0-8kHz HTK scaling
    assert 15 <= peak_bin <= 35, peak_bin


def test_audio_frontend_shapes_and_grads(rng):
    B, L, S = 2, 3, 2000
    wav = jnp.asarray(rng.standard_normal((B, L, S)).astype(np.float32))
    m = LogMelFrontend(out_dim=64, n_fft=256, hop=128, n_mels=24,
                       channels=16)
    params = m.init(jax.random.PRNGKey(0), wav)
    out = m.apply(params, wav)
    assert out.shape == (B, L, 64)

    def loss(p):
        return jnp.sum(m.apply(p, wav) ** 2)
    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_vision_frontend_shapes_and_grads(rng):
    B, L, H, W = 2, 3, 32, 32
    frames = jnp.asarray(rng.standard_normal((B, L, H, W, 3))
                         .astype(np.float32))
    m = DenseNetFrontend(out_dim=48, growth=8, block_config=(2, 2),
                         stem_channels=16)
    params = m.init(jax.random.PRNGKey(0), frames)
    out = m.apply(params, frames)
    assert out.shape == (B, L, 48)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.sum(m.apply(p, frames) ** 2)
    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_vision_frontend_batch_independence(rng):
    """GroupNorm (not BatchNorm): one sample's output can't depend on the
    rest of the batch — required for B=1 serving."""
    frames = rng.standard_normal((2, 2, 16, 16, 3)).astype(np.float32)
    m = DenseNetFrontend(out_dim=16, growth=8, block_config=(2,),
                         stem_channels=16)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(frames))
    full = np.asarray(m.apply(params, jnp.asarray(frames)))
    solo = np.asarray(m.apply(params, jnp.asarray(frames[:1])))
    np.testing.assert_allclose(full[:1], solo, atol=1e-5)
