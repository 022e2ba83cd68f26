from fusion_tpu.index.compression import (
    CompressedTokenIndex,
    kmeans,
    compress_token_index,
    maxsim_search_compressed,
)
from fusion_tpu.index.inverted import (
    ImpactIndex,
    activations_to_query_terms,
    build_impact_index,
    impact_search,
    sparse_to_impact_index,
)

__all__ = [
    "CompressedTokenIndex",
    "kmeans",
    "compress_token_index",
    "maxsim_search_compressed",
    "ImpactIndex",
    "activations_to_query_terms",
    "build_impact_index",
    "impact_search",
    "sparse_to_impact_index",
]
