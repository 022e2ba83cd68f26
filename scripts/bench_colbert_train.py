"""One ColBERT training step at the reference's preset scale, on the chip.

Reference training config (scripts/run_colbert.sh:26,69-76 via
multi_dense_biencoder.py:56): bs=128, n-way (1 pos + 7 negs), doc maxlen
up to 256 for mMARCO training, dim=128, CamemBERT-base trunk.  Measures
the full jitted step (3 encoder forwards + batched n-way MaxSim + loss +
backward + AdamW update) with the host-fetch fence discipline.

Run:  PYTHONPATH=/root/repo python scripts/bench_colbert_train.py
      [--batch 128] [--nway 8] [--doc_len 256] [--steps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/bench_colbert_train.py` without PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--nway", type=int, default=8)
    ap.add_argument("--query_len", type=int, default=32)
    ap.add_argument("--doc_len", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    ap.add_argument("--attention", default="einsum",
                    choices=["einsum", "einsum_bf16", "flash"],
                    help="flash = Pallas flash-attention kernel (no [L, L] probs recompute under remat)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.models.colbert import ColBERT
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.train.trainer import FitConfig, init_train_state, make_colbert_train_step

    if args.tiny:
        cfg = EncoderConfig.tiny(vocab_size=1024)
        args.batch, args.doc_len = 4, 32
    else:
        # CamemBERT-base shape; remat is REQUIRED at this scale — without it
        # the 12-layer activation set for the 896-doc negative forward sums
        # to ~400 GB of temps (measured via compiled memory_analysis)
        cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16, remat=True,
                            attention_impl=args.attention)
    bs, npq = args.batch, args.nway - 1
    lq, ld = args.query_len, args.doc_len

    model = ColBERT(cfg, dim=128 if not args.tiny else 16,
                    max_query_length=lq, max_doc_length=ld)
    fit_cfg = FitConfig(steps=args.steps, learning_rate=5e-6, scheduler="constant")
    state, tx, _ = init_train_state(model, fit_cfg)
    step_fn = make_colbert_train_step(model, tx, loss_name="ce")

    rng = np.random.default_rng(0)
    v = cfg.vocab_size

    def tok(n, length):
        ids = rng.integers(5, v, size=(n, length), dtype=np.int32)
        mask = np.ones((n, length), np.float32)
        return jnp.asarray(ids), jnp.asarray(mask)

    q_ids, q_mask = tok(bs, lq)
    p_ids, p_mask = tok(bs, ld)
    n_ids, n_mask = tok(bs * npq, ld)
    batch = {
        "query_ids": q_ids, "query_mask": q_mask,
        "pos_ids": p_ids, "pos_mask": p_mask,
        "neg_ids": n_ids, "neg_mask": n_mask,
    }

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    np.asarray(metrics["loss"])  # fetch fence
    print(f"# compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    np.asarray(metrics["loss"])
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch)
    np.asarray(metrics["loss"])
    elapsed = time.perf_counter() - t0
    if args.steps > 1:
        dt = max((elapsed - t_single) / (args.steps - 1), 1e-9)
    else:
        dt = max(elapsed, 1e-9)

    enc_tokens = bs * (lq + ld * args.nway)

    # achieved TFLOP/s + MFU (verdict r04 #4/#3) — the XLA FLOP count of the
    # compiled step includes the remat recompute, so this is the HARDWARE
    # utilization; the "useful"-FLOP MFU (fwd+bwd only, 3x fwd) is lower by
    # the remat factor and reported alongside.
    from fusion_tpu.utils.profiling import mfu_report, peak_tflops

    m = mfu_report(step_fn, (state, batch), dt)
    p_matmul = cfg.num_layers * 12 * cfg.hidden_size ** 2
    useful_tflop = 3 * 2 * p_matmul * enc_tokens / 1e12  # fwd + 2x-fwd bwd
    print(json.dumps({
        "metric": "colbert_train_step_ms",
        "value": round(dt * 1000, 2),
        "unit": "ms/step",
        "detail": {
            "batch": bs, "nway": args.nway, "query_len": lq, "doc_len": ld,
            "examples_per_s": round(bs / dt, 1),
            "tokens_per_step": enc_tokens,
            "attention": args.attention,
            "backend": jax.default_backend(),
            "mfu_hw": m or None,
            "useful_tflops_per_s": round(useful_tflop / dt, 1),
            "useful_mfu": round(useful_tflop / dt / peak_tflops(), 4),
        },
    }))


if __name__ == "__main__":
    main()
