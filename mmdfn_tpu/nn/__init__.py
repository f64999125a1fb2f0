from mmdfn_tpu.nn.rnn import BiRNN, LSTMCellStep, crn_party_delta
from mmdfn_tpu.nn.linear import TorchDense

__all__ = ["BiRNN", "LSTMCellStep", "crn_party_delta", "TorchDense"]
