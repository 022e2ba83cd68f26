"""Bisect the gather_rows Pallas kernel's Mosaic compile failure on chip.

Round-4 history: the raw-dtype DMA kernel crashed the remote compile
helper (HTTP 500, no diagnostic), 057e6eb made the kernel f32-only with
callers bitcasting rows to f32 lanes ([G, 128] copies), yet the
bench_mmarco A/B legs STILL crash the helper at production shapes.  The
one shape known to pass is G == 1 (a [1, 128] f32 row copy).  This
bisects the remaining dimensions through the production ``gather_rows``
wrapper: G (row f32 lanes 128 / 256 / 512), source count, rows_per_block,
in_flight, and the grid scale, each at small N so a pass/fail is cheap.

Run ONLY on the bench chip (claims the TPU).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.ops.gather_rows import gather_rows

    n = 4096
    rng = np.random.default_rng(0)

    def src(dtype, row):
        return jnp.asarray(rng.integers(0, 100, size=(n, row)).astype(dtype))

    def idx_of(q, k):
        return jnp.asarray(rng.integers(0, n, size=(q, k), dtype=np.int32))

    idx = idx_of(4, 256)

    cases = {
        # G=1: the known-good shape (512 B f32 rows)
        "f32_g1": dict(srcs=(src(np.float32, 128),), idx=idx),
        # G=2 / G=4: wider rows — the codes source is G=2 in production
        "f32_g2": dict(srcs=(src(np.float32, 256),), idx=idx),
        "f32_g4": dict(srcs=(src(np.float32, 512),), idx=idx),
        # u8 codes through the wrapper's bitcast (f32 G=2)
        "u8_1024B_g2": dict(srcs=(src(np.uint8, 1024),), idx=idx),
        # two DMA sources in one launch (both G=1)
        "two_g1": dict(srcs=(src(np.float32, 128), src(np.float32, 128)),
                       idx=idx),
        # production grid scale at G=1 (Q=64, K=4096, rb=256 -> grid 64x16)
        "g1_grid_prod": dict(srcs=(src(np.float32, 128),), idx=idx_of(64, 4096)),
        # rows_per_block / in_flight variations at G=2
        "f32_g2_rb64": dict(srcs=(src(np.float32, 256),), idx=idx,
                            rows_per_block=64),
        "f32_g2_if4": dict(srcs=(src(np.float32, 256),), idx=idx,
                           in_flight=4),
        # the real rescore 3-source config (cid i32 32 + codes u8 1024 +
        # mask u8 32; only codes rides the DMA, the rest fall back)
        "real_3src": dict(
            srcs=(src(np.int32, 32), src(np.uint8, 1024), src(np.uint8, 32)),
            idx=idx),
        # --- grid/SMEM bisect: g1_grid_prod (idx 64x4096 = 1 MB i32 in
        # scalar-prefetch SMEM) crashed while every small case passed.
        # Which dimension: Q (grid rows), K/rb (grid cols), or the idx
        # SMEM footprint?
        "g1_q64_k256": dict(srcs=(src(np.float32, 128),),
                            idx=idx_of(64, 256)),      # 64 KB, grid (64,1)
        "g1_q4_k4096": dict(srcs=(src(np.float32, 128),),
                            idx=idx_of(4, 4096)),      # 64 KB, grid (4,16)
        "g1_q16_k1024": dict(srcs=(src(np.float32, 128),),
                             idx=idx_of(16, 1024)),    # 64 KB, grid (16,4)
        "g1_q64_k1024": dict(srcs=(src(np.float32, 128),),
                             idx=idx_of(64, 1024)),    # 256 KB (nc1024 prod)
        "g1_q64_k2048": dict(srcs=(src(np.float32, 128),),
                             idx=idx_of(64, 2048)),    # 512 KB
        "g1_q32_k4096": dict(srcs=(src(np.float32, 128),),
                             idx=idx_of(32, 4096)),    # 512 KB
    }

    report = {}
    for name, kw in cases.items():
        srcs = kw.pop("srcs")
        case_idx = kw.pop("idx")
        try:
            out = gather_rows(srcs, case_idx, use_pallas=True, **kw)
            ref = tuple(np.asarray(s)[np.asarray(case_idx)] for s in srcs)
            ok = all(
                np.array_equal(np.asarray(o), r) for o, r in zip(out, ref)
            )
            report[name] = "OK" if ok else "COMPILED_BUT_WRONG"
        except Exception as e:  # pragma: no cover - chip-only bisect
            report[name] = f"{type(e).__name__}: {e}"[:160].replace("\n", " ")
        sys.stderr.write(f"# {name}: {report[name][:90]}\n")
        sys.stderr.flush()
    print(json.dumps({"metric": "gather_rows_bisect", "detail": report}))


if __name__ == "__main__":
    main()
