from fusion_tpu.index.compression import CompressedTokenIndex, kmeans, compress_token_index

__all__ = ["CompressedTokenIndex", "kmeans", "compress_token_index"]
