from fusion_tpu.core.ranked import RankedLists, PAD_ID

__all__ = ["RankedLists", "PAD_ID"]
