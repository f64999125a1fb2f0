from mmdfn_tpu.models.baselines import (DialogRNNModel, DialogueRNN, GRUModel,
                                        LSTMModel)
from mmdfn_tpu.models.dialogue_gnn import DialogueGNN
from mmdfn_tpu.models.mm_gcn import MMGCN, MMGCN2, DeepGCNII
from mmdfn_tpu.models.relation_net import (DenseGraphConv, DenseRGCNConv,
                                           GraphNetwork)

__all__ = [
    "MMGCN", "MMGCN2", "DeepGCNII", "DialogueGNN",
    "GraphNetwork", "DenseRGCNConv", "DenseGraphConv",
    "DialogueRNN", "GRUModel", "LSTMModel", "DialogRNNModel",
]
