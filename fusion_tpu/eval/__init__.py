from fusion_tpu.eval.metrics import Metrics, compute_precision_recall_f1

__all__ = ["Metrics", "compute_precision_recall_f1"]
