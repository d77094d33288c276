from hhrs_tpu.retrieval.graph import FriendGraph
from hhrs_tpu.retrieval.similarity import cosine_topk, normalize_rows, build_neighbor_table
from hhrs_tpu.retrieval.candidates import CandidateGenerator

__all__ = [
    "FriendGraph",
    "cosine_topk",
    "normalize_rows",
    "build_neighbor_table",
    "CandidateGenerator",
]
