from mmdfn_tpu.frontends.audio import LogMelFrontend, log_mel_spectrogram
from mmdfn_tpu.frontends.vision import DenseNetFrontend

__all__ = ["LogMelFrontend", "log_mel_spectrogram", "DenseNetFrontend"]
