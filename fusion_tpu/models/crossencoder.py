"""monoBERT cross-encoder reranker.

Replaces the reference's ``CrossEncoderCustom`` (sentence_transformers.py:
498-721): pointwise relevance over (query, document) pairs — sigmoid logit,
BCE training — used to rerank fused candidate lists (hybrid.py:139-163,
460-462).  Scoring batches (query, doc) token pairs through one jitted
forward; reranking is a device top-k over the candidate scores.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import fusion_tpu
from fusion_tpu.data import tokenization
from fusion_tpu.core.ranked import RankedLists, ranked_from_scores
from fusion_tpu.data.tokenization import WordHashTokenizer, pair_encode_simple
from fusion_tpu.models.encoder import Encoder, EncoderConfig
from fusion_tpu.models.heads import CrossEncoderHead

CONFIG_FILENAME = "config_fusion_tpu.json"


class CrossEncoderModule(nn.Module):
    cfg: EncoderConfig

    def setup(self):
        # attribute names double as param-scope names, matching the
        # pre-setup @nn.compact tree ("encoder", "head") exactly
        self.encoder = Encoder(self.cfg)
        self.head = CrossEncoderHead(self.cfg)

    def __call__(self, input_ids, attention_mask, deterministic=True):
        return self.head(self.encoder(input_ids, attention_mask, deterministic))

    def packed(
        self,
        input_ids,
        attention_mask,
        position_ids,
        segment_ids,
        gather_row,
        gather_col,
        deterministic=True,
    ):
        """Packed-row scoring: many (query, doc) pairs per sequence row.

        ``segment_ids`` make attention block-diagonal (pairs never attend
        across each other), ``position_ids`` restart per pair, and each
        pair's logit is read from its own CLS slot at
        ``(gather_row[p], gather_col[p])`` — so scores equal the unpacked
        one-pair-per-row forward exactly while no MXU cycle is spent on
        padding."""
        hidden = self.encoder(
            input_ids,
            attention_mask,
            deterministic,
            position_ids=position_ids,
            segment_ids=segment_ids,
        )
        cls = hidden[gather_row, gather_col]  # [P, H]
        return self.head(cls[:, None, :])


class PairRerankMixin:
    """Device-resident (query, doc) pair rerank machinery, shared by
    cross-encoder backbones (BERT-style ``CrossEncoder``, T5-style
    ``T5CrossEncoder``).

    A subclass provides ``score_tokens(params, ids, mask, train=...)``,
    ``predict``, and the attributes ``cfg`` (with ``vocab_size``),
    ``max_length``, ``tokenizer``, ``params``; it may override
    ``_pair_layout`` (default: ``[CLS | q | SEP | d]``) and
    ``PAIR_SPECIALS`` (how many special-token slots that layout inserts —
    used for MXU lane alignment of the pair sequence)."""

    PAIR_SPECIALS = 2

    def prepare_corpus_tokens(
        self,
        documents: Sequence[str],
        max_doc_tokens: int | None = None,
        return_lens: bool = False,
    ):
        """Tokenize the corpus ONCE into fixed-shape device arrays.

        Returns raw doc token ids/mask ``int32[N, Ld]`` with no special
        tokens — the jitted rerank program assembles ``[CLS] q [SEP] d``
        pairs on device by gather+concat, so serving never re-tokenizes
        documents per query (the reference re-tokenizes every (q, d) pair
        per rerank call, sentence_transformers.py:498-557)."""
        ld = max_doc_tokens if max_doc_tokens is not None else max(self.max_length - 36, 16)
        ids, mask = self.tokenizer(documents, max_length=ld, add_special_tokens=False)
        # uint16 token matrix when the vocab fits: at corpus scale this
        # matrix is the rerank stage's whole memory bill (8.8M docs × 256
        # tokens = 9 GB int32 vs 4.5 GB); the rerank program only gathers
        # candidate rows and upcasts those
        id_dtype = jnp.uint16 if self.cfg.vocab_size <= 65_535 else jnp.int32
        mask_np = np.asarray(mask, dtype=np.int8)
        out = (
            jnp.asarray(np.asarray(ids).astype(id_dtype)),
            jnp.asarray(mask_np),
        )
        if return_lens:
            # host-side token counts for the length-bucketed rerank path —
            # computed BEFORE upload (a device round-trip at corpus scale
            # would ship the whole mask back through the tunnel)
            return out + (mask_np.sum(axis=1).astype(np.int32),)
        return out

    def encode_queries_raw(
        self, queries: Sequence[str], max_query_tokens: int = 32
    ) -> tuple[np.ndarray, np.ndarray]:
        """Raw query tokens (no specials) for the device rerank program."""
        return self.tokenizer(queries, max_length=max_query_tokens, add_special_tokens=False)

    def _pair_layout(self, q_ids, q_mask, d_ids, d_mask):
        """[n, Lq] + [n, Ld] → fixed-slot pair tokens [n, 2 + Lq + Ld].

        Layout ``[CLS | q (Lq slots) | SEP | d (Ld slots)]`` — query padding
        stays mid-sequence with attention 0, so no data-dependent packing is
        needed under jit; mid-sequence pad slots hold the pad id so position
        ids stay consistent with the host path (roberta positions skip pads).
        """
        n = q_ids.shape[0]
        tok = self.tokenizer
        cls_col = jnp.full((n, 1), tok.cls_token_id, jnp.int32)
        sep_col = jnp.full((n, 1), tok.sep_token_id, jnp.int32)
        ones = jnp.ones((n, 1), jnp.int32)
        ids = jnp.concatenate(
            [cls_col, q_ids.astype(jnp.int32), sep_col, d_ids.astype(jnp.int32)], axis=-1
        )
        mask = jnp.concatenate(
            [ones, q_mask.astype(jnp.int32), ones, d_mask.astype(jnp.int32)], axis=-1
        )
        return jnp.where(mask > 0, ids, tok.pad_token_id), mask

    def _score_pairs_chunked(self, params, flat_ids, flat_mask, pair_chunk: int):
        """[n, L] pair tokens → [n] logits, ``lax.map`` over pair_chunk-sized
        chunks to bound activation memory."""
        n, seq = flat_ids.shape
        tok = self.tokenizer
        pc = min(pair_chunk, n)
        nchunks = -(-n // pc)
        padn = nchunks * pc - n
        if padn:
            pad_ids = jnp.full((padn, seq), tok.pad_token_id, jnp.int32)
            # keep CLS attended on filler rows so softmax stays finite
            pad_mask = jnp.zeros((padn, seq), jnp.int32).at[:, 0].set(1)
            flat_ids = jnp.concatenate([flat_ids, pad_ids])
            flat_mask = jnp.concatenate([flat_mask, pad_mask])
        logits = jax.lax.map(
            lambda c: self.score_tokens(params, c[0], c[1], train=False),
            (flat_ids.reshape(nchunks, pc, seq), flat_mask.reshape(nchunks, pc, seq)),
        )
        return logits.reshape(-1)[:n]

    def rerank_tokens(
        self,
        params,
        q_ids: jax.Array,
        q_mask: jax.Array,
        doc_ids: jax.Array,
        doc_mask: jax.Array,
        pair_chunk: int = 512,
    ) -> jax.Array:
        """Jittable candidate scoring: [Q, K] relevance logits in one program.

        Every pair is padded to the full doc width; see
        ``rerank_tokens_bucketed`` for the length-bucketed serving variant.
        """
        q, k, ld = doc_ids.shape
        lq = q_ids.shape[1]
        qe = jnp.broadcast_to(q_ids[:, None, :], (q, k, lq)).reshape(q * k, lq)
        qm = jnp.broadcast_to(q_mask[:, None, :], (q, k, lq)).reshape(q * k, lq)
        d_ids = doc_ids.reshape(q * k, ld)
        d_msk = doc_mask.reshape(q * k, ld)
        # round the pair seq up to a 128-lane multiple: a mid-tile seq is
        # measurably SLOWER in absolute terms than the next multiple on a
        # v5e (254 -> 1721 ms vs 256 -> 1370 ms at 3072 pairs; see
        # aligned_buckets); pad slots carry attention 0, scores are exact
        pad = -(self.PAIR_SPECIALS + lq + ld) % 128
        if pad:
            d_ids = jnp.pad(d_ids, ((0, 0), (0, pad)))
            d_msk = jnp.pad(d_msk, ((0, 0), (0, pad)))
        ids, mask = self._pair_layout(qe, qm, d_ids, d_msk)
        return self._score_pairs_chunked(params, ids, mask, pair_chunk).reshape(q, k)

    def rerank_tokens_cascade(
        self,
        params,
        q_ids: jax.Array,
        q_mask: jax.Array,
        doc_ids: jax.Array,
        doc_mask: jax.Array,
        keep: int,
        stage1_tokens: int,
        pair_chunk: int = 512,
    ) -> jax.Array:
        """Two-stage jittable rerank: stage 1 scores ALL K candidates with
        docs truncated to ``stage1_tokens``; the top-``keep`` by stage-1
        logit are rescored at full width.

        FLOPs ≈ flat · (stage1_tokens/Ld + keep/K) — e.g. keep=K/4 with a
        Ld/4 prefilter costs ~half the flat stage.  The returned [Q, K]
        logits keep a TOTAL order: kept candidates carry their full-width
        logits, the rest carry stage-1 logits shifted strictly below the
        kept minimum (their stage-1 relative order preserved).  Degenerate
        settings (keep ≥ K and stage1_tokens ≥ Ld) equal ``rerank_tokens``
        exactly.  Quality trade: a relevant doc whose evidence lives beyond
        the stage-1 truncation AND whose prefix scores below the stage-1
        cut is lost — measure on the target corpus before enabling."""
        q, k, ld = doc_ids.shape
        keep = max(1, min(keep, k))
        w1 = min(stage1_tokens, ld)
        if keep >= k or w1 >= ld:
            # degenerate settings: a full-width stage (either one) already
            # scores every candidate exactly — one flat pass, no cascade
            return self.rerank_tokens(params, q_ids, q_mask, doc_ids, doc_mask, pair_chunk)
        s1 = self.rerank_tokens(
            params, q_ids, q_mask, doc_ids[:, :, :w1], doc_mask[:, :, :w1], pair_chunk
        )
        # keep slots must go to REAL candidates: pad slots (serving zeroes
        # their doc_mask for head_ids < 0) score a query-only "empty doc"
        # logit that could otherwise outrank weak real candidates and steal
        # their full-width rescore
        valid = doc_mask.sum(axis=-1) > 0  # [Q, K]
        _, idx = jax.lax.top_k(jnp.where(valid, s1, -jnp.inf), keep)  # [Q, keep]
        d2 = jnp.take_along_axis(doc_ids, idx[..., None], axis=1)
        m2 = jnp.take_along_axis(doc_mask, idx[..., None], axis=1)
        s2 = self.rerank_tokens(params, q_ids, q_mask, d2, m2, pair_chunk)
        # non-kept slots: stage-1 scores shifted strictly below the kept
        # minimum (margin 1.0 in logit space)
        kept_min = s2.min(axis=1, keepdims=True)
        kept_mask = jnp.zeros((q, k), bool)
        kept_mask = jax.vmap(lambda m, i: m.at[i].set(True))(kept_mask, idx)
        rest_max = jnp.where(kept_mask, -jnp.inf, s1).max(axis=1, keepdims=True)
        rest = s1 - jnp.maximum(rest_max - kept_min + 1.0, 0.0)
        out = jax.vmap(lambda o, i, v: o.at[i].set(v))(rest, idx, s2)
        return out

    # -- length-bucketed rerank (host-orchestrated) ---------------------
    # chunk-count grid bounds the number of compiled shapes per bucket
    # width; dense through 16 then ~12% geometric steps (the old sparse
    # grid overshot a 5-chunk bucket to 6 — +20% wasted pairs)
    _BUCKET_CHUNK_GRID = (
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
        18, 20, 22, 25, 28, 32, 36, 40, 45, 51, 57, 64, 72, 81, 91, 102, 114, 128,
    )

    @classmethod
    def aligned_buckets(cls, lq: int, ld_full: int, align: int = 128) -> tuple:
        """Doc-width ladder whose PAIR sequence lengths land on ``align``
        multiples (pair seq = PAIR_SPECIALS + lq + ld).  Measured on a v5e
        (scripts/probe_rerank_width.py): per-pair cost is NOT monotone in
        width — seq 256 runs 25% FASTER than seq 254 in absolute terms
        (1370 vs 1721 ms at 3072 pairs), so the last bucket rounds UP past
        the corpus width rather than sitting mid-tile; lane alignment is
        128, not 64 (seq 192 costs 2304 ns/token vs 1742 at 256)."""
        ladder = []
        k = 1
        while True:
            ld = align * k - (lq + cls.PAIR_SPECIALS)
            if ld > 0:
                ladder.append(ld)
            if ld >= ld_full:
                break
            k += 1
        return tuple(ladder)

    def _bucket_fns(self, ld: int, cap: int, pc: int):
        """Jitted scorer + scatter for one (doc width, capacity) bucket shape."""
        cache = getattr(self, "_bucket_jit_cache", None)
        if cache is None:
            cache = self._bucket_jit_cache = {}
        key = (ld, cap, pc)
        if key not in cache:

            def score_scatter(params, q_ids, q_mask, doc_tokens, doc_mask, packed, buf):
                # packed [4, cap] int32 rows: q_row, cand, pvalid, slot —
                # ONE host->device upload per bucket (vs 4; each upload
                # pays full RTT on a tunneled host).  Gather candidate doc
                # rows, truncate to the bucket width; corpus tokens may be
                # stored uint16/int8 — upcast the gathered candidates only.
                q_row, cand, pvalid, slot = (packed[i] for i in range(4))
                # bucket may be WIDER than the corpus token matrix (the
                # last bucket rounds the pair seq up to a lane multiple);
                # pad-slot ids are rewritten to pad_token_id by
                # _pair_layout and carry attention 0, so scores are exact
                w = min(ld, doc_tokens.shape[1])
                d_ids = doc_tokens[cand][:, :w].astype(jnp.int32)
                d_msk = doc_mask[cand][:, :w].astype(jnp.int32) * pvalid[:, None]
                if ld > w:
                    d_ids = jnp.pad(d_ids, ((0, 0), (0, ld - w)))
                    d_msk = jnp.pad(d_msk, ((0, 0), (0, ld - w)))
                qe = q_ids[q_row].astype(jnp.int32)
                qm = q_mask[q_row].astype(jnp.int32)
                ids, mask = self._pair_layout(qe, qm, d_ids, d_msk)
                vals = self._score_pairs_chunked(params, ids, mask, pc)
                # filler entries carry slot == len(buf) - 1 (trimmed after)
                return buf.at[slot].set(vals)

            cache[key] = jax.jit(score_scatter)
        return cache[key]

    def rerank_tokens_bucketed(
        self,
        params,
        q_ids: jax.Array,  # [Q, Lq] device
        q_mask: jax.Array,
        doc_tokens: jax.Array,  # [N, Ld_full] device (uint16/int32)
        doc_mask: jax.Array,  # [N, Ld_full] device (int8/int32)
        head_ids: np.ndarray,  # [Q, Kr] HOST candidate ids (pad -1)
        doc_lens: np.ndarray,  # [N] HOST token counts
        buckets: Sequence[int] | None = None,  # None -> MXU-aligned ladder
        pair_chunk: int = 512,
    ) -> jax.Array:
        """Length-bucketed candidate scoring: [Q, Kr] logits on device.

        Pads each (query, candidate) pair only to the smallest bucket width
        that fits its document instead of the corpus-wide max — encoder
        FLOPs scale with tokens, so a 40–220-token length mix runs ~1.5x
        faster than the flat ``rerank_tokens`` path.  EXACT vs the
        full-width path: pad slots carry attention 0 (excluded from softmax
        by the additive bias) and do not shift roberta position ids (the
        non-pad cumsum skips them), so a doc scores identically at any
        width ≥ its length.

        Host-orchestrated: candidate ids must be on the host (one small
        fetch per batch — ~0.1 ms on local PCIe), which is why this is not
        part of the single fused device program.  Compiled shapes are
        bounded by snapping each bucket's pair count to a geometric
        chunk-count grid (filler pairs score a CLS-only row and are
        discarded).
        """
        qn, kr = head_ids.shape
        n_docs, ld_full = doc_tokens.shape
        flat = head_ids.reshape(-1).astype(np.int64)
        valid = flat >= 0
        safe = np.clip(flat, 0, n_docs - 1)
        lens = np.where(valid, np.asarray(doc_lens)[safe], 0)
        if buckets is None:
            buckets = self.aligned_buckets(int(q_ids.shape[1]), ld_full)
        # buckets wider than the corpus matrix are allowed (seq-alignment
        # round-up); the last rung must cover every stored doc width
        ladder = sorted({int(b) for b in buckets if b > 0})
        if not ladder or ladder[-1] < ld_full:
            ladder.append(ld_full)
        bidx = np.searchsorted(np.asarray(ladder), lens)
        n = qn * kr
        # extra slot swallows filler writes
        buf = jnp.full(n + 1, 0.0, jnp.float32)
        for bi, ld in enumerate(ladder):
            sel = np.nonzero(bidx == bi)[0]
            if sel.size == 0:
                continue
            pc = min(pair_chunk, max(256, 1 << (sel.size - 1).bit_length()))
            nchunks = -(-sel.size // pc)
            for g in self._BUCKET_CHUNK_GRID:
                if g >= nchunks:
                    nchunks = g
                    break
            cap = nchunks * pc
            packed = np.zeros((4, cap), np.int32)
            packed[0, : sel.size] = sel // kr          # q_row
            packed[1, : sel.size] = safe[sel]          # cand
            packed[2, : sel.size] = valid[sel]         # pvalid
            packed[3, :] = n                           # slot (filler -> spill)
            packed[3, : sel.size] = sel
            score_scatter = self._bucket_fns(ld, cap, pc)
            buf = score_scatter(
                params, q_ids, q_mask, doc_tokens, doc_mask,
                jnp.asarray(packed), buf,
            )
        return buf[:n].reshape(qn, kr)

    # -- packed rerank (host-planned, device-assembled) ------------------
    @staticmethod
    def pack_pairs(plen: np.ndarray, width: int, quantum: int = 8):
        """Quantized first-fit-decreasing bin packing of pair lengths into
        rows of ``width`` tokens.  Returns (row, offset, n_rows).

        Rows are tracked in remaining-capacity classes of ``quantum``
        tokens, so placing P pairs costs O(P · width/quantum) — ~0.4M
        trivial ops at the serving shape (6400 pairs, width 512), well
        under a millisecond of the multi-second stage it plans.  Fill
        measured ≥0.93 on uniform 40–220-token docs."""
        plen = np.asarray(plen, np.int64)
        if plen.size and int(plen.max()) > width:
            raise ValueError(f"pair length {int(plen.max())} exceeds row width {width}")
        order = np.argsort(-plen, kind="stable")
        nclasses = width // quantum
        buckets: list[list[int]] = [[] for _ in range(nclasses + 1)]
        rem: list[int] = []
        row = np.zeros(plen.shape[0], np.int32)
        off = np.zeros(plen.shape[0], np.int32)
        for pi in order:
            ln = int(plen[pi])
            r = -1
            for c in range(-(-ln // quantum), nclasses + 1):
                if buckets[c]:
                    r = buckets[c].pop()
                    break
            if r < 0:
                r = len(rem)
                rem.append(width)
            off[pi] = width - rem[r]
            rem[r] -= ln
            nc = rem[r] // quantum
            if nc > 0:
                buckets[nc].append(r)
            row[pi] = r
        return row, off, len(rem)

    def plan_packed(
        self,
        head_ids: np.ndarray,  # [Q, Kr] HOST candidate ids (pad -1)
        doc_lens: np.ndarray,  # [N] HOST token counts
        q_lens: np.ndarray,  # [Q] HOST query token counts
        lq_max: int,
        ld_max: int,
        n_docs: int,
        row_width: int | None = None,
        rows_per_chunk: int | None = None,
        chunk_multiple: int = 1,
    ):
        """Host-side packing plan shared by the single-chip and sharded
        packed rerank paths.  Returns (desc [6, P] int32, tables
        [nchunks, pc_cap, 3] int32, width, nchunks, rpc, pc_cap) where
        nchunks is grid-bounded (bounded recompiles) and a multiple of
        ``chunk_multiple`` (so a mesh can own whole chunk groups)."""
        qn, kr = head_ids.shape
        flat = head_ids.reshape(-1).astype(np.int64)
        valid = flat >= 0
        safe = np.clip(flat, 0, n_docs - 1).astype(np.int32)
        dlen = np.where(valid, np.asarray(doc_lens)[safe], 0).astype(np.int32)
        dlen = np.minimum(dlen, ld_max)
        qrow = (np.arange(qn * kr) // kr).astype(np.int32)
        qlen = np.minimum(np.asarray(q_lens, np.int32), lq_max)[qrow]
        # pair length follows the backbone's layout: BERT [CLS|q|SEP|d]
        # inserts 2 specials, T5 [q|EOS|d] inserts 1 (PAIR_SPECIALS)
        plen = (self.PAIR_SPECIALS + qlen + dlen).astype(np.int32)
        maxp = int(plen.max()) if plen.size else 2
        # default width: ~1.5x the longest pair, rounded up to the 128-lane
        # multiple — the chip-measured optimum at CamemBERT-base serving
        # shape (64qx100 pairs, Lq 32, Ld 40-220: packed384 1774 ms vs
        # packed256 1868 / packed512 2032 / flat 2929; probe_rerank_packed,
        # 2026-08-19).  Wider rows fit fewer rows per MXU pass than the
        # extra fill saves; narrower rows strand long pairs alone per row.
        width = row_width or max(256, -(-(3 * maxp) // 256) * 128)
        row, off, n_rows = self.pack_pairs(plen, width)
        # reorder descriptors by (row, offset): the device owner map is a
        # running max of scattered (index + 1) markers, which identifies
        # the nearest-preceding pair only if indices increase along a row
        perm = np.lexsort((off, row))
        qrow, safe, qlen, dlen, row, off = (
            a[perm] for a in (qrow, safe, qlen, dlen, row, off)
        )
        out_slot = perm.astype(np.int32)  # sorted pair j writes flat slot perm[j]
        rpc = rows_per_chunk or max(8, (64 * 512) // width)
        units = -(-max(n_rows, 1) // (rpc * chunk_multiple))
        for g in self._BUCKET_CHUNK_GRID:
            if g >= units:
                units = g
                break
        nchunks = units * chunk_multiple
        # per-chunk pair readout tables [nchunks, pc_cap, 3]:
        # (local row, col, output slot); filler entries spill
        chunk_of = row // rpc
        counts = np.bincount(chunk_of, minlength=nchunks)
        cmax = int(counts.max()) if counts.size else 0
        pc_cap = max(8, 1 << max(0, cmax - 1).bit_length()) if cmax else 8
        tables = np.zeros((nchunks, pc_cap, 3), np.int32)
        tables[:, :, 2] = qn * kr  # spill slot
        # descriptors are (row, offset)-sorted, so chunk_of is already
        # non-decreasing — rank within chunk by position
        first = np.searchsorted(chunk_of, np.arange(nchunks))
        jj = np.arange(chunk_of.size) - first[chunk_of]
        tables[chunk_of, jj, 0] = row - chunk_of * rpc
        tables[chunk_of, jj, 1] = off
        tables[chunk_of, jj, 2] = out_slot
        desc = np.stack([qrow, safe, row, off, qlen, dlen]).astype(np.int32)
        return desc, tables, width, nchunks, rpc, pc_cap

    @property
    def _packed_consts(self) -> tuple:
        """(cls_id, sep_id, pad_id, roberta, cfg_pad) for row assembly."""
        tok = self.tokenizer
        pad_id = tok.pad_token_id
        return (
            tok.cls_token_id,
            tok.sep_token_id,
            pad_id,
            int(getattr(self.cfg, "position_offset", 2)) != 0,
            int(getattr(self.cfg, "pad_token_id", pad_id)),
        )

    @staticmethod
    def assemble_packed_rows(desc, q_ids, drows, R, W, consts):
        """Device-side assembly of [R, W] packed token rows from the host
        plan.  ``desc`` [6, P] (see plan_packed), ``drows`` [P, Ld] the
        candidate doc-token rows (already gathered/reconstructed by the
        caller — the sharded path psum-reconstructs them across doc-range
        shards).  Returns (ids, mask, seg, pos), each [R, W]."""
        cls_id, sep_id, pad_id, roberta, cfg_pad = consts
        qrow, cand, prow, poff, qlen, dlen = (desc[i] for i in range(6))
        n_pairs = qrow.shape[0]
        plen = 2 + qlen + dlen
        start = jnp.zeros((R * W,), jnp.int32)
        start = start.at[prow * W + poff].set(
            jnp.arange(1, n_pairs + 1, dtype=jnp.int32)
        )
        # owner of every row position: pairs are packed contiguously,
        # so a running max of the scattered (pair index + 1) start
        # markers identifies the owning pair; positions past the
        # owner's extent fall out via t < plen
        own = jax.lax.associative_scan(jnp.maximum, start.reshape(R, W), axis=1)
        p = jnp.maximum(own - 1, 0)
        t = jnp.arange(W, dtype=jnp.int32)[None, :] - poff[p]
        ql = qlen[p]
        inseg = (own > 0) & (t < plen[p])
        is_cls = inseg & (t == 0)
        is_sep = inseg & (t == ql + 1)
        in_q = inseg & (t >= 1) & (t <= ql)
        in_d = inseg & (t >= ql + 2)
        lq_max = q_ids.shape[1]
        qtok = q_ids[qrow[p], jnp.clip(t - 1, 0, lq_max - 1)].astype(jnp.int32)
        dtok = drows[p, jnp.clip(t - 2 - ql, 0, drows.shape[1] - 1)]
        ids = jnp.where(
            is_cls, cls_id,
            jnp.where(is_sep, sep_id, jnp.where(in_q, qtok, jnp.where(in_d, dtok, pad_id))),
        )
        mask = inseg.astype(jnp.int32)
        seg = own * mask
        if roberta:
            # per-segment RoBERTa positions: within a pair every
            # token is non-pad, so the non-pad cumsum is t + 1 —
            # exactly the positions the unpacked pair row gets
            # (mid-sequence query pads there are skipped by the
            # cumsum); bounded by pair length, NOT row width, so
            # rows may be wider than max_position
            pos = jnp.where(inseg, t + 1 + cfg_pad, cfg_pad)
        else:
            pos = jnp.where(inseg, t, 0)
        return ids, mask, seg, pos

    def _packed_fns(self, width: int, nchunks: int, rpc: int, pc_cap: int):
        """Jitted packed scorer for one (row width, chunk grid) shape."""
        cache = getattr(self, "_packed_jit_cache", None)
        if cache is None:
            cache = self._packed_jit_cache = {}
        key = (width, nchunks, rpc, pc_cap)
        if key not in cache:
            W, R = width, nchunks * rpc
            consts = self._packed_consts

            def score_packed(params, q_ids, q_mask, doc_tokens, doc_mask, desc, tables, buf):
                # desc [6, P]: q_row, cand, row, offset, qlen, dlen — the
                # ONLY per-batch upload (plus tables); token rows are
                # assembled on device so nothing big crosses the host link
                # two-step doc gather: candidate rows once (compact), then
                # the [R, W] positional lookup hits the small [P, Ld] matrix
                # instead of element-gathering from the corpus-scale table
                drows = doc_tokens[desc[1]].astype(jnp.int32)
                ids, mask, seg, pos = self.assemble_packed_rows(
                    desc, q_ids, drows, R, W, consts
                )
                shape_c = (nchunks, rpc, W)

                def one(args):
                    ci, cm, cs, cp, tb = args
                    return self.packed_score_tokens(
                        params, ci, cm, cp, cs, tb[:, 0], tb[:, 1]
                    )

                logits = jax.lax.map(
                    one,
                    (
                        ids.reshape(shape_c), mask.reshape(shape_c),
                        seg.reshape(shape_c), pos.reshape(shape_c),
                        tables,
                    ),
                )  # [nchunks, pc_cap]
                slots = tables[:, :, 2].reshape(-1)
                return buf.at[slots].set(logits.reshape(-1))

            cache[key] = jax.jit(score_packed)
        return cache[key]

    def rerank_tokens_packed(
        self,
        params,
        q_ids: jax.Array,  # [Q, Lq] device
        q_mask: jax.Array,
        doc_tokens: jax.Array,  # [N, Ld_full] device (uint16/int32)
        doc_mask: jax.Array,  # [N, Ld_full] device (unused; kept for API parity)
        head_ids: np.ndarray,  # [Q, Kr] HOST candidate ids (pad -1)
        doc_lens: np.ndarray,  # [N] HOST token counts (contiguous masks)
        q_lens: np.ndarray,  # [Q] HOST query token counts
        row_width: int | None = None,
        rows_per_chunk: int | None = None,
    ) -> jax.Array:
        """Sequence-packed candidate scoring: [Q, Kr] logits on device.

        Packs (query, doc) pairs back-to-back into fixed ``row_width``-token
        rows (first-fit decreasing) with block-diagonal attention via
        segment ids and per-pair position restarts — the TPU-idiomatic
        answer to variable-length pairs: zero MXU cycles on padding beyond
        the row tails (fill ≥0.93), static shapes throughout.  EXACT vs
        ``rerank_tokens``: same tokens, same positions, attention confined
        to the pair.  Goes beyond the bucketed path, which still pads every
        pair up to its 128-aligned bucket width (a 40-token doc costs 128).

        Requires contiguous doc/query attention masks (true for every
        tokenizer here — ``doc_lens``/``q_lens`` stand in for the masks on
        the host side).  BERT-position models (position_offset=0) get
        compact per-pair absolute positions, matching the host-tokenized
        pair rather than the mid-sequence-padded device layout."""
        if not hasattr(self, "packed_score_tokens"):
            raise NotImplementedError(
                f"{type(self).__name__} has no packed_score_tokens; packed rerank "
                "requires segment-aware attention (CrossEncoder and "
                "T5CrossEncoder both provide it)"
            )
        qn, kr = head_ids.shape
        desc, tables, width, nchunks, rpc, pc_cap = self.plan_packed(
            head_ids, doc_lens, q_lens,
            int(q_ids.shape[1]), int(doc_tokens.shape[1]),
            int(doc_tokens.shape[0]),
            row_width=row_width, rows_per_chunk=rows_per_chunk,
        )
        buf = jnp.zeros(qn * kr + 1, jnp.float32)
        fn = self._packed_fns(width, nchunks, rpc, pc_cap)
        out = fn(
            params, q_ids, q_mask, doc_tokens, doc_mask,
            jnp.asarray(desc), jnp.asarray(tables), buf,
        )
        return out[: qn * kr].reshape(qn, kr)

    def rerank(
        self,
        queries: Sequence[str],
        candidates: RankedLists,
        corpus: dict[int, str] | Sequence[str],
        top_k: int = 100,
        batch_size: int = 64,
    ) -> RankedLists:
        """Rerank the top candidates of each query; fixed-shape in and out.

        Mirrors the hybrid pipeline's rerank stage (hybrid.py:460-462): the
        fused candidate lists go through the cross-encoder and are re-sorted
        by its scores.
        """
        lookup = corpus if isinstance(corpus, dict) else {i: d for i, d in enumerate(corpus)}
        k = min(top_k, candidates.depth)
        ids = np.asarray(candidates.ids)[:, :k]
        all_scores = np.full(ids.shape, -np.inf, dtype=np.float32)
        # ONE batched predict over every (query, candidate) pair — the
        # reference loops per query through CrossEncoder.rank
        # (hybrid.py:139-163); flattening keeps the device at full batches
        pairs, slots = [], []
        for qi, query in enumerate(queries):
            for col, cid in enumerate(ids[qi]):
                if cid < 0:
                    continue
                pairs.append((query, lookup.get(int(cid), "")))
                slots.append((qi, col))
        if pairs:
            scores = self.predict(pairs, batch_size=batch_size)
            rows, cols = zip(*slots)
            all_scores[np.asarray(rows), np.asarray(cols)] = scores
        ranked = ranked_from_scores(jnp.asarray(all_scores), k)
        # ranked ids are column positions; map back to corpus ids
        pos = np.asarray(ranked.ids)
        remapped = np.take_along_axis(ids, np.clip(pos, 0, k - 1), axis=1)
        remapped = np.where(pos < 0, -1, remapped)
        return RankedLists(ids=jnp.asarray(remapped), scores=ranked.scores)


class CrossEncoder(PairRerankMixin):
    def __init__(
        self,
        cfg: EncoderConfig,
        params: Any = None,
        tokenizer=None,
        max_length: int = 256,
        seed: int = 42,
    ):
        self.cfg = cfg
        self.max_length = max_length
        self.module = CrossEncoderModule(cfg)
        if params is None:
            dummy = jnp.ones((1, 4), dtype=jnp.int32)
            params = self.module.init(
                jax.random.PRNGKey(seed), dummy, jnp.ones((1, 4), jnp.int32), deterministic=True
            )
        self.params = params
        self.tokenizer = tokenizer or WordHashTokenizer(vocab_size=cfg.vocab_size)
        self._score_jit = None

    # functional forward for training steps
    def score_tokens(self, params, input_ids, attention_mask, train: bool = False, rngs=None):
        return self.module.apply(
            params, input_ids, attention_mask, deterministic=not train, rngs=rngs
        )

    def packed_score_tokens(
        self, params, input_ids, attention_mask, position_ids, segment_ids,
        gather_row, gather_col, train: bool = False, rngs=None,
    ):
        """Packed-row forward (see CrossEncoderModule.packed)."""
        return self.module.apply(
            params, input_ids, attention_mask, position_ids, segment_ids,
            gather_row, gather_col, deterministic=not train, rngs=rngs,
            method=CrossEncoderModule.packed,
        )

    def _encode_pairs(self, queries: Sequence[str], docs: Sequence[str]):
        if hasattr(self.tokenizer, "pair"):
            return self.tokenizer.pair(queries, docs, self.max_length)
        return pair_encode_simple(self.tokenizer, queries, docs, self.max_length)

    def _get_score_fn(self):
        if self._score_jit is None:
            self._score_jit = jax.jit(
                lambda params, ids, mask: self.score_tokens(params, ids, mask, train=False)
            )
        return self._score_jit

    def predict(
        self, pairs: Sequence[tuple[str, str]], batch_size: int = 64, apply_sigmoid: bool = True
    ) -> np.ndarray:
        """Relevance scores for (query, doc) pairs."""
        fn = self._get_score_fn()
        out = []
        for start in range(0, len(pairs), batch_size):
            chunk = list(pairs[start : start + batch_size])
            real = len(chunk)
            while len(chunk) < batch_size and len(pairs) > batch_size:
                chunk.append(("", ""))
            ids, mask = self._encode_pairs([q for q, _ in chunk], [d for _, d in chunk])
            logits = np.asarray(fn(self.params, jnp.asarray(ids), jnp.asarray(mask)))[:real]
            out.append(logits)
        logits = np.concatenate(out, axis=0) if out else np.zeros(0, np.float32)
        if apply_sigmoid:
            return 1.0 / (1.0 + np.exp(-logits))
        return logits

    def rank(
        self, query: str, documents: Sequence[str], top_k: int | None = None, batch_size: int = 64
    ) -> list[dict]:
        """Rerank one query's candidates (reference CrossEncoder.rank API)."""
        scores = self.predict([(query, d) for d in documents], batch_size=batch_size)
        order = np.argsort(-scores, kind="stable")[: top_k or len(documents)]
        return [{"corpus_id": int(i), "score": float(scores[i])} for i in order]

    def quantized(self, mode: str = "int8") -> "CrossEncoder":
        """Serving view of this model: same params/tokenizer, trunk dense
        matmuls run through the dynamic int8 MXU path
        (encoder.int8_dot_general).  Chip-measured a WASH on the testbed
        v5e (rerank stage 3053 vs 2877 ms bf16; raw int8 MXU is only ~1.2×
        bf16 there — INT8_MXU_PROBE_r04.json), so this is NOT a default;
        probe the target chip first.  Measure ranking quality before
        deploying (scripts/cascade_study.py --int8); do not train through
        it (zero gradient at the rounding)."""
        cfg = dataclasses.replace(self.cfg, quantize=mode)
        return CrossEncoder(
            cfg, params=self.params, tokenizer=self.tokenizer,
            max_length=self.max_length,
        )

    def with_attention(self, impl: str) -> "CrossEncoder":
        """Serving-speed view with a different attention implementation,
        same params/tokenizer.  ``einsum_bf16`` (2-byte attention buffers,
        ~0.4 % softmax error, MRR-identical on the study model) is the
        measured-fastest exact-quality serving impl: rerank stage
        3061 → 2852 ms/batch at depth 100, CamemBERT-base shape
        (BENCH_r04 rerank detail; chip-measured 2026-08-19)."""
        if impl == self.cfg.attention_impl:
            return self
        cfg = dataclasses.replace(self.cfg, attention_impl=impl)
        return CrossEncoder(
            cfg, params=self.params, tokenizer=self.tokenizer,
            max_length=self.max_length,
        )

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        config = {
            "model_type": "crossencoder",
            "max_length": self.max_length,
            "tokenizer": tokenization.tokenizer_config(self.tokenizer),
            "encoder": {k: v for k, v in dataclasses.asdict(self.cfg).items() if k != "dtype"},
            "__version__": {"fusion_tpu": fusion_tpu.__version__, "jax": jax.__version__},
        }
        with open(os.path.join(path, CONFIG_FILENAME), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.params))

    @classmethod
    def from_pretrained_hf(
        cls, model_name_or_path: str, max_length: int = 256, seed: int = 42
    ) -> "CrossEncoder":
        """Trunk weights from a locally cached HF checkpoint; the relevance
        head starts fresh (the reference also trains it from scratch,
        sentence_transformers.py:550-557)."""
        from fusion_tpu.data.tokenization import HFTokenizer
        from fusion_tpu.models.encoder import load_hf_encoder_params

        cfg, hf_params = load_hf_encoder_params(model_name_or_path)
        try:
            tokenizer = HFTokenizer(model_name_or_path)
        except Exception:  # checkpoint without tokenizer files
            tokenizer = None
        model = cls(cfg, tokenizer=tokenizer, max_length=max_length, seed=seed)
        params = jax.tree_util.tree_map(lambda x: x, model.params)
        params["params"]["encoder"] = hf_params["params"]["encoder"]
        model.params = params
        return model

    @classmethod
    def load(cls, path: str, tokenizer=None) -> "CrossEncoder":
        from flax import serialization

        with open(os.path.join(path, CONFIG_FILENAME)) as f:
            config = json.load(f)
        if tokenizer is None:
            tokenizer = tokenization.tokenizer_from_config(config.get("tokenizer"))
        cfg = EncoderConfig(**config["encoder"])
        model = cls(cfg, tokenizer=tokenizer, max_length=config["max_length"])
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            from fusion_tpu.models.encoder import restore_params_bytes

            model.params = restore_params_bytes(model.params, f.read())
        return model
