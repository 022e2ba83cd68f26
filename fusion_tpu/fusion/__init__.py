from fusion_tpu.fusion.aggregator import Aggregator, build_percentile_distribution, tune_fusion_weights

__all__ = ["Aggregator", "build_percentile_distribution", "tune_fusion_weights"]
