from fusion_tpu.index.compression import (
    CompressedTokenIndex,
    kmeans,
    compress_token_index,
    maxsim_search_compressed,
)

__all__ = [
    "CompressedTokenIndex",
    "kmeans",
    "compress_token_index",
    "maxsim_search_compressed",
]
