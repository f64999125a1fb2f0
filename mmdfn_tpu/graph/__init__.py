from mmdfn_tpu.graph.adjacency import (
    angular_similarity,
    intra_modal_similarity,
    cross_modal_diag_similarity,
    mm_big_adjacency,
    mm_wo_speaker_adjacency,
    gcnii_block_adjacency,
    directed_speaker_adjacency,
    window_relation_adjacency,
    symmetric_normalize,
)
from mmdfn_tpu.graph.relation import window_edge_mask, relation_type_ids

__all__ = [
    "angular_similarity",
    "intra_modal_similarity",
    "cross_modal_diag_similarity",
    "mm_big_adjacency",
    "mm_wo_speaker_adjacency",
    "gcnii_block_adjacency",
    "directed_speaker_adjacency",
    "window_relation_adjacency",
    "symmetric_normalize",
    "window_edge_mask",
    "relation_type_ids",
]
