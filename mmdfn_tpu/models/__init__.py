from mmdfn_tpu.models.mm_gcn import MMGCN, MMGCN2, DeepGCNII

__all__ = ["MMGCN", "MMGCN2", "DeepGCNII"]
