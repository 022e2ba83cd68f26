from fusion_tpu.train import losses, optim, schedules

__all__ = ["losses", "optim", "schedules"]
