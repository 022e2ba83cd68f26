"""Learning-rate schedules.

The reference uses HF ``get_scheduler`` with 'linear' + warmup-ratio presets
everywhere (splade.py:192, run_*.sh warmup 4%). optax equivalents built from
the same (steps, warmup_ratio) surface.
"""

from __future__ import annotations

import optax


def linear_with_warmup(
    learning_rate: float, total_steps: int, warmup_ratio: float = 0.04,
    warmup_steps: int | None = None,
) -> optax.Schedule:
    """HF 'linear': 0 → lr over warmup, then linear decay to 0 at total_steps."""
    warmup = warmup_steps if warmup_steps is not None else int(total_steps * warmup_ratio)
    warmup = max(warmup, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup),
            optax.linear_schedule(learning_rate, 0.0, max(total_steps - warmup, 1)),
        ],
        boundaries=[warmup],
    )


def cosine_with_warmup(
    learning_rate: float, total_steps: int, warmup_ratio: float = 0.04
) -> optax.Schedule:
    warmup = max(int(total_steps * warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup,
        decay_steps=total_steps,
    )


def get_schedule(name: str, learning_rate: float, total_steps: int, warmup_ratio: float = 0.04):
    """Scheduler registry mirroring the reference's CLI choices."""
    if name == "linear":
        return linear_with_warmup(learning_rate, total_steps, warmup_ratio)
    if name == "cosine":
        return cosine_with_warmup(learning_rate, total_steps, warmup_ratio)
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    if name == "constant_with_warmup":
        warmup = max(int(total_steps * warmup_ratio), 1)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup), optax.constant_schedule(learning_rate)],
            boundaries=[warmup],
        )
    raise ValueError(f"unknown schedule {name!r}")
