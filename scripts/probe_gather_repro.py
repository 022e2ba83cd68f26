"""Bisect the gather_rows Pallas kernel's Mosaic compile failure on chip.

probe_plaid's round-4 A/B legs all failed with `MosaicError: INTERNAL:
remote_compile HTTP 500: tpu_compile_helper subprocess exit code 1` — the
compile helper CRASHES (no diagnostic comes back through the relay), so
this bisects by construction: compile tiny variants of the kernel that
differ in one dimension each (row width, dtype, source count, in_flight,
grid shape) and report which compile and which crash.

Run ONLY on the bench chip (claims the TPU).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.ops.gather_rows import gather_rows_pallas

    n, q, k = 4096, 4, 256
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(q, k), dtype=np.int32))

    def src(dtype, row):
        return jnp.asarray(
            rng.integers(0, 100, size=(n, row)).astype(dtype)
        )

    cases = {
        # the real rescore config: cid i32[., 32] + codes u8[., 1024] + mask u8[., 32]
        "real_3src": dict(
            srcs=(src(np.int32, 32), src(np.uint8, 1024), src(np.uint8, 32))
        ),
        "one_i32_128B": dict(srcs=(src(np.int32, 32),)),
        "one_u8_1024B": dict(srcs=(src(np.uint8, 1024),)),
        "one_u8_32B": dict(srcs=(src(np.uint8, 32),)),  # sub-128B row suspect
        "one_u8_128B": dict(srcs=(src(np.uint8, 128),)),
        "one_f32_512B": dict(srcs=(src(np.float32, 128),)),
        "one_i32_inflight1": dict(srcs=(src(np.int32, 32),), in_flight=1),
        "one_i32_rb64": dict(srcs=(src(np.int32, 32),), rows_per_block=64),
        "two_i32_u8w": dict(srcs=(src(np.int32, 32), src(np.uint8, 1024))),
    }

    report = {}
    for name, kw in cases.items():
        srcs = kw.pop("srcs")
        try:
            out = gather_rows_pallas(srcs, idx, **kw)
            ref = tuple(np.asarray(s)[np.asarray(idx)] for s in srcs)
            ok = all(
                np.array_equal(np.asarray(o), r) for o, r in zip(out, ref)
            )
            report[name] = "OK" if ok else "COMPILED_BUT_WRONG"
        except Exception as e:  # pragma: no cover - chip-only bisect
            report[name] = f"{type(e).__name__}: {e}"[:160].replace("\n", " ")
        sys.stderr.write(f"# {name}: {report[name][:80]}\n")
    print(json.dumps({"metric": "gather_rows_bisect", "detail": report}))


if __name__ == "__main__":
    main()
