"""Profile where the ColBERT train step spends its time on the chip.

VERDICT r2 item 6: the step measured 2139 ms at bs128 × 8-way × doc 256
(einsum attention, full remat).  This probe times, at the SAME doc-forward
shape (bs 896, L 256, CamemBERT-base config):

  * encoder forward alone, per attention impl — isolates the fwd MFU;
  * forward+backward of a scalar loss over the encoder (remat on), per
    attention impl — isolates the remat+bwd multiple;
  * optional flash BlockSizes sweep (``--sweep_flash``) — the default
    block_b=1 launches B·H tiny kernel instances at L=256.

Prints one JSON line per measurement.  Run ONLY on the bench chip.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=896)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--impls", default="einsum,einsum_bf16")
    ap.add_argument("--sweep_flash", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (use with tiny --batch/--seq)")
    ap.add_argument("--sweep_splash", action="store_true",
                    help="time splash-attention MHA vs the einsum reference "
                         "at the train shape (full mask, L=256)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from fusion_tpu.models.encoder import EncoderConfig, init_encoder_params

    B, L = args.batch, args.seq
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 30000, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)

    def fetch(x):
        return np.asarray(x)

    def tiny_fence(out):
        """Fetch ONE element — fencing on the full output would ship
        hundreds of MB through the ~30 MB/s tunnel and dominate the time."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        fetch(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)

    def timeit(fn, *a):
        tiny_fence(fn(*a))  # compile + first
        t0 = time.perf_counter()
        for _ in range(3):
            fetch(jnp.zeros(()))
        rtt = (time.perf_counter() - t0) / 3
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            tiny_fence(fn(*a))
            ts.append(time.perf_counter() - t0 - rtt)
        return float(np.median(ts))

    # matmul-FLOP speed of light for reference
    p_matmul = 12 * 12 * 768 * 768  # 12 layers × (qkv 3 + out 1 + ffn 8) H²
    tokens = B * L
    fwd_tflop = 2 * p_matmul * tokens / 1e12

    for spec in args.impls.split(","):
        # 'einsum_bf16+int8' = int8 trunk matmuls (VERDICT r3 #8: measure or
        # rule out int8 for the ColBERT TRAINING forward — the serving-side
        # int8 injection, models/encoder.py quantize='int8', under grad)
        impl, _, quant = spec.partition("+")
        cfg = EncoderConfig(dropout=0.0, dtype=jnp.bfloat16, remat=True,
                            attention_impl=impl, quantize=quant or None)
        model, params = init_encoder_params(cfg, with_mlm=False)

        fwd = jax.jit(lambda p, i, m: model.apply(p, i, m))
        dt_f = timeit(fwd, params, ids, mask)

        def loss_fn(p):
            h = model.apply(p, ids, mask)
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-9

        out = {
            "impl": spec, "batch": B, "seq": L,
            "fwd_ms": round(dt_f * 1000, 1),
            "fwd_tflops": round(fwd_tflop / dt_f, 1),
        }
        try:
            grad = jax.jit(jax.grad(loss_fn))
            dt_g = timeit(grad, params)
            out["train_fwd_bwd_ms"] = round(dt_g * 1000, 1)
            out["fwd_bwd_tflops"] = round(4 * fwd_tflop / dt_g, 1)
        except Exception as e:  # noqa: BLE001 — int8 grad may be unsupported
            out["train_fwd_bwd_error"] = str(e)[:160]
        print(json.dumps(out))
        sys.stdout.flush()

    if args.sweep_flash:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        H, HD = 12, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, HD), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, HD), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, HD), jnp.bfloat16)
        seg = jnp.ones((B, L), jnp.int32)

        def ref_attn(q, k, v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            p = jax.nn.softmax(logits / 8.0, axis=-1).astype(jnp.bfloat16)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        def ref_loss(q, k, v):
            return jnp.sum(ref_attn(q, k, v).astype(jnp.float32) ** 2)

        g_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))
        dt = timeit(g_ref, q, k, v)
        dt_f = timeit(jax.jit(ref_attn), q, k, v)
        print(json.dumps({"flash_sweep": "einsum_reference",
                          "attn_fwd_ms": round(dt_f * 1000, 1),
                          "attn_bwd_ms": round(dt * 1000, 1)}))
        sys.stdout.flush()

        for bb in (1, 4, 8, 16):
            bs = BlockSizes(
                block_q=256, block_k_major=256, block_k=256, block_b=bb,
                block_q_major_dkv=256, block_k_major_dkv=256,
                block_k_dkv=256, block_q_dkv=256,
                block_k_major_dq=256, block_k_dq=256, block_q_dq=256,
            )

            def floss(q, k, v, bs=bs):
                o = flash_attention(
                    q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                    causal=False, sm_scale=1 / 8.0, block_sizes=bs,
                )
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def fwd_only(q, k, v, bs=bs):
                return flash_attention(
                    q, k, v, segment_ids=SegmentIds(q=seg, kv=seg),
                    causal=False, sm_scale=1 / 8.0, block_sizes=bs,
                )

            g = jax.jit(jax.grad(floss, argnums=(0, 1, 2)))
            try:
                dt_f = timeit(jax.jit(fwd_only), q, k, v)
                dt = timeit(g, q, k, v)
                print(json.dumps({"flash_sweep": f"block_b={bb}",
                                  "attn_fwd_ms": round(dt_f * 1000, 1),
                                  "attn_bwd_ms": round(dt * 1000, 1)}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"flash_sweep": f"block_b={bb}",
                                  "error": str(e)[:120]}))
            sys.stdout.flush()


    if args.sweep_splash:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
        )
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_mask as sm,
        )

        H, HD = 12, 64
        q = jax.random.normal(jax.random.PRNGKey(0), (B, H, L, HD), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, HD), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, L, HD), jnp.bfloat16)

        mask = sm.MultiHeadMask([sm.FullMask((L, L)) for _ in range(H)])
        kernel = sk.make_splash_mha(
            mask, head_shards=1, q_seq_shards=1,
        )

        def sloss(q, k, v):
            o = jax.vmap(kernel)(q * (1 / 8.0), k, v)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def sfwd(q, k, v):
            return jax.vmap(kernel)(q * (1 / 8.0), k, v)

        try:
            dt_f = timeit(jax.jit(sfwd), q, k, v)
            dt = timeit(jax.jit(jax.grad(sloss, argnums=(0, 1, 2))), q, k, v)
            print(json.dumps({"splash": "full_mask",
                              "attn_fwd_ms": round(dt_f * 1000, 1),
                              "attn_bwd_ms": round(dt * 1000, 1)}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"splash": "full_mask", "error": str(e)[:160]}))


if __name__ == "__main__":
    main()
