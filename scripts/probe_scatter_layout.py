"""Chip A/B for the SPLADE scatter leg's POSTING LAYOUT (round-4 regression).

probe_scatter measured the pre-gather (`_gather_postings`) alone at
38.5 ms — ~60 % of the regressed scatter leg — while its bytes are ~1 GB
of coalescible traffic (≈1.5 ms at HBM speed).  The suspects are the
[Q, Kq, C, capc] → [Q, C, Kq, capc] inner-dims transpose and the
uint16→int32 converts feeding it.  This probe splits the stage costs and
A/Bs two fixes at mMARCO scale:

  * ``2b``: transpose the 2-byte gathered arrays, convert AFTER (halves
    transpose traffic);
  * ``nt``: a transpose-free kernel — grid (q, chunk-block), BlockSpec
    fetches the strided [1, Kq, CB, capc] block straight from the
    UNTRANSPOSED gather output, and the kernel flattens each chunk's
    [Kq, capc] postings to the [1, W] row the one-hot matmul wants
    (compilability of that sublane→lane reshape on the current Mosaic is
    exactly what this probe tests — guarded, reports FAILED on compile
    errors instead of dying).

Run ONLY on the bench chip; prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n_docs", type=int, default=8_912_896)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=32_768)
    ap.add_argument("--kq", type=int, default=64)
    ap.add_argument("--docs_per_chunk", type=int, default=16_384)
    ap.add_argument("--capc", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-shape CPU run (interpret-mode kernels) for "
                         "correctness only")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.n_docs, args.vocab, args.batch = 4096 * 8, 512, 4
        args.docs_per_chunk, args.kq = 4096, 8
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fusion_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import fusion_tpu.ops.scatter_score as ss
    from fusion_tpu.index.inverted import CHUNK_SENTINEL, ChunkedImpactIndex
    from fusion_tpu.ops.dense_topk import BIN, _select_topk
    from fusion_tpu.ops.scatter_score import (
        LANES,
        _SHIFT,
        _gather_postings,
        _plan,
        scatter_impact_search,
    )

    if args.cpu:
        ss._INTERPRET = True

    N, B, V, KQ = args.n_docs, args.batch, args.vocab, args.kq
    DPC, CAPC = args.docs_per_chunk, args.capc
    C = -(-N // DPC)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    post_doc = jax.random.randint(k1, (V + 1, C, CAPC), 0, DPC, jnp.int32
                                  ).astype(jnp.uint16)
    post_imp = jax.random.uniform(k2, (V + 1, C, CAPC), jnp.float32, 0.05, 3.0
                                  ).astype(jnp.float16)
    index = ChunkedImpactIndex(
        post_doc, post_imp, n_docs=N, docs_per_chunk=DPC, vocab_size=V,
        cap_per_chunk=CAPC, nnz_kept=(V + 1) * C * CAPC,
    )
    q_terms = jax.random.randint(k3, (B, KQ), 0, V, dtype=jnp.int32)
    q_weights = jnp.ones((B, KQ), jnp.float32)
    np.asarray(post_doc[:1, :1, :1])

    tiny = jnp.zeros(()) + 1.0
    np.asarray(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny)
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)

    def timeit(fn, *a):
        out = fn(*a)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            times.append(time.perf_counter() - t0)
        return max(float(np.median(times)) - rtt, 1e-9)

    CB = 16

    # ---- stage splits of the current pregather -------------------------
    @jax.jit
    def gather_only(qt, pd):
        terms = jnp.clip(qt, 0, pd.shape[0] - 1)
        return pd[terms].astype(jnp.int32)  # [Q, Kq, C, capc]

    @jax.jit
    def gather_2b_transpose_convert(qt, qw, pd, pi):
        """E2: move 2-byte rows through the transpose, widen after."""
        q, kq = qt.shape
        vp1, c, capc = pd.shape
        terms = jnp.clip(qt, 0, vp1 - 1)
        docs = pd[terms].transpose(0, 2, 1, 3).reshape(q, c, kq * capc)
        vals = pi[terms].transpose(0, 2, 1, 3).reshape(q, c, kq * capc)
        docs = docs.astype(jnp.int32)
        vals = vals.astype(jnp.bfloat16) * jnp.repeat(
            qw.astype(jnp.bfloat16), capc, axis=1)[:, None, :]
        c_pad = -(-c // CB) * CB
        if c_pad != c:
            docs = jnp.pad(docs, ((0, 0), (0, c_pad - c), (0, 0)),
                           constant_values=CHUNK_SENTINEL)
            vals = jnp.pad(vals, ((0, 0), (0, c_pad - c), (0, 0)))
        return docs, vals

    # ---- transpose-free gather + kernel --------------------------------
    @functools.partial(jax.jit, static_argnames=("chunk_block",))
    def gather_nt(qt, qw, pd, pi, chunk_block):
        q, kq = qt.shape
        vp1, c, capc = pd.shape
        terms = jnp.clip(qt, 0, vp1 - 1)
        docs = pd[terms].astype(jnp.int32)  # [Q, Kq, C, capc]
        vals = pi[terms].astype(jnp.bfloat16) * qw[..., None, None].astype(
            jnp.bfloat16)
        c_pad = -(-c // chunk_block) * chunk_block
        if c_pad != c:
            docs = jnp.pad(docs, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)),
                           constant_values=CHUNK_SENTINEL)
            vals = jnp.pad(vals, ((0, 0), (0, 0), (0, c_pad - c), (0, 0)))
        return docs, vals

    def _kernel_nt(docs_ref, vals_ref, out_ref, *, h, chunk_block, kq, capc):
        g = h // BIN
        w = kq * capc
        docs = docs_ref[0]  # [Kq, CB, capc]
        vals = vals_ref[0]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, w), 0)
        for bidx in range(chunk_block):
            d = jnp.reshape(docs[:, bidx, :], (1, w))
            v = jnp.reshape(vals[:, bidx, :], (1, w))
            a = ((d >> _SHIFT) == iota_h).astype(jnp.bfloat16) * v
            b = ((d & (LANES - 1)) == iota_l).astype(jnp.bfloat16)
            raw = jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            scores = jnp.where(raw > 0, raw, -jnp.inf)
            m = jnp.full((g, LANES), -jnp.inf, jnp.float32)
            offs = jnp.zeros((g, LANES), jnp.uint32)
            for s in range(BIN):
                chunk = scores[s * g : (s + 1) * g, :]
                upd = chunk > m
                m = jnp.where(upd, chunk, m)
                offs = jnp.where(upd, jnp.uint32(s), offs)
            bits = jax.lax.bitcast_convert_type(m, jnp.uint32)
            packed = (bits & jnp.uint32(0xFFFFFFF0)) | offs
            out = jax.lax.bitcast_convert_type(packed, jnp.float32)
            out_ref[0, bidx] = jnp.where(jnp.isfinite(m), out, -jnp.inf)

    @functools.partial(
        jax.jit,
        static_argnames=("n_docs", "docs_per_chunk", "k", "chunk_block"),
    )
    def search_nt(docs4, vals4, n_docs, docs_per_chunk, k, chunk_block):
        h = _plan(docs_per_chunk)
        g = h // BIN
        q, kq, c_pad, capc = docs4.shape
        packed = pl.pallas_call(
            functools.partial(_kernel_nt, h=h, chunk_block=chunk_block,
                              kq=kq, capc=capc),
            grid=(q, c_pad // chunk_block),
            in_specs=[
                pl.BlockSpec((1, kq, chunk_block, capc),
                             lambda qi, ci: (qi, 0, ci, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kq, chunk_block, capc),
                             lambda qi, ci: (qi, 0, ci, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, chunk_block, g, LANES), lambda qi, ci: (qi, ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((q, c_pad, g, LANES), jnp.float32),
            interpret=args.cpu,
        )(docs4, vals4)
        packed = packed.reshape(q, c_pad * g * LANES)
        return _select_topk(packed, n_docs, k, docs_per_chunk, 0.99)

    def full_nt(qt, qw, idx):
        docs4, vals4 = gather_nt(qt, qw, idx.post_doc, idx.post_impact, CB)
        return search_nt(docs4, vals4, idx.n_docs, idx.docs_per_chunk,
                         min(1000, idx.n_docs), CB)

    report = {"n_docs": N, "batch": B, "vocab": V, "kq": KQ,
              "docs_per_chunk": DPC, "cap_per_chunk": CAPC, "chunks": C}

    # correctness first: nt vs baseline ranked lists
    base = scatter_impact_search(q_terms, q_weights, index, k=1000,
                                 chunk_block=CB,
                                 use_pallas=not args.cpu or None)
    try:
        nt = full_nt(q_terms, q_weights, index)
        ids_b, sc_b = np.asarray(base.ids), np.asarray(base.scores)
        ids_n, sc_n = np.asarray(nt.ids), np.asarray(nt.scores)
        report["nt_scores_match"] = bool(
            np.allclose(sc_b, sc_n, rtol=1e-5, atol=1e-5, equal_nan=True))
        report["nt_top10_overlap"] = round(float(np.mean([
            len(set(ids_b[i, :10]) & set(ids_n[i, :10])) / 10
            for i in range(ids_b.shape[0])
        ])), 4)
        nt_ok = True
    except Exception as e:  # Mosaic compile failure is a RESULT here
        report["nt_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        nt_ok = False

    gather = functools.partial(_gather_postings, chunk_block=CB)
    report["pregather_ms"] = round(
        timeit(gather, q_terms, q_weights, post_doc, post_imp) * 1000, 2)
    report["gather_only_i32_ms"] = round(
        timeit(gather_only, q_terms, post_doc) * 1000, 2)
    report["pregather_2b_ms"] = round(
        timeit(gather_2b_transpose_convert, q_terms, q_weights, post_doc,
               post_imp) * 1000, 2)
    report["gather_nt_ms"] = round(
        timeit(functools.partial(gather_nt, chunk_block=CB), q_terms,
               q_weights, post_doc, post_imp) * 1000, 2)

    fn = functools.partial(scatter_impact_search, k=1000, chunk_block=CB)
    report["scatter_baseline_ms"] = round(
        timeit(fn, q_terms, q_weights, index) * 1000, 2)
    if nt_ok:
        report["scatter_nt_ms"] = round(
            timeit(full_nt, q_terms, q_weights, index) * 1000, 2)

    sys.stderr.write(f"# {report}\n")
    print(json.dumps({"metric": "scatter_layout_probe", "detail": report}))


if __name__ == "__main__":
    main()
