"""Bi-encoder retrieval models: DPR (dense) and SPLADE (learned sparse).

One class covers the reference's two bi-encoder families —
``SentenceTransformerCustom`` dense retrieval (sentence_transformers.py:43)
and the SPLADE family (splade/base.py:20-433, splade/splade.py:16-577) —
because on TPU they differ only in the head applied to the shared encoder
trunk:

  * head='dense'  → pooled hidden state (mean/max/cls)        [B, H]
  * head='splade' → log1p(relu(MLM logits)) max/sum pooled    [B, V]
                    with optional top-k pruning (splade.py:295-306)

Everything device-side is functional (params are explicit); the class holds
host state: config, tokenizer policy, and cached jitted executables.

SPLADE presets (pooling + training recipe defaults) mirror the reference's
six variants (splade.py:362-577) as data, not subclasses: ``SPLADE_PRESETS``.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import shutil
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import fusion_tpu
from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.data import tokenization
from fusion_tpu.data.tokenization import TextEncoder, WordHashTokenizer
from fusion_tpu.models import heads
from fusion_tpu.models.encoder import (
    Encoder,
    EncoderConfig,
    EncoderWithMLM,
    init_encoder_params,
)
from fusion_tpu.ops.mips import dense_search

CONFIG_FILENAME = "config_fusion_tpu.json"


# training recipes of the six reference SPLADE variants (splade.py:362-577)
SPLADE_PRESETS: dict[str, dict] = {
    "spladev1": {
        "pooling": "sum",
        "rank_loss": {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05},
        "reg_loss": {"query_reg": "FlopsLoss", "query_reg_weight": 3e-4,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "triplet", "negs_type": "original"},
    },
    "spladev2": {
        "pooling": "max",
        "rank_loss": {"name": "InfoNCELoss", "use_ib_negs": True, "temperature": 0.05},
        "reg_loss": {"query_reg": "FlopsLoss", "query_reg_weight": 3e-4,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "triplet", "negs_type": "original"},
    },
    "spladeplus": {
        "pooling": "max",
        "rank_loss": {"name": "MarginMSELoss", "teacher_scale": 0.08},
        "reg_loss": {"query_reg": "FlopsLoss", "query_reg_weight": 3e-4,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "tuple_with_scores", "negs_type": "hard",
                 "negs_mining_systems": "bm25", "negs_per_query": 1},
    },
    "spladeplus_ensemble": {
        "pooling": "max",
        "rank_loss": {"name": "MarginMSELoss", "teacher_scale": 0.08},
        "reg_loss": {"query_reg": "FlopsLoss", "query_reg_weight": 3e-4,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "tuple_with_scores", "negs_type": "hard",
                 "negs_mining_systems": "all", "negs_per_query": 1},
    },
    "spladeeff": {
        "pooling": "max",
        "rank_loss": {"name": "KLDLoss"},
        "reg_loss": {"query_reg": "L1Loss", "query_reg_weight": 1e-2,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "tuple_with_scores", "negs_type": "hard",
                 "negs_mining_systems": "all", "negs_per_query": 1},
    },
    "spladev3": {
        "pooling": "max",
        "rank_loss": {"name": "KLDLoss"},
        "reg_loss": {"query_reg": "FlopsLoss", "query_reg_weight": 3e-4,
                     "doc_reg": "FlopsLoss", "doc_reg_weight": 1e-4},
        "data": {"training_sample_format": "tuple_with_scores", "negs_type": "hard",
                 "negs_mining_systems": "all", "negs_per_query": 8},
    },
}


class BiEncoder:
    """Siamese encoder with a dense or sparse head."""

    def __init__(
        self,
        cfg: EncoderConfig,
        params: Any = None,
        tokenizer=None,
        head: str = "dense",
        pooling: str | None = None,
        similarity: str = "cos_sim",
        pruning_topk: int | None = None,
        max_query_length: int = 32,
        max_doc_length: int = 128,
        query_prefix: str | None = None,
        doc_prefix: str | None = None,
        augment_query_to_maxlen: bool = False,
        augment_doc_to_maxlen: bool = False,
        do_lowercase: bool = False,
        seed: int = 42,
    ):
        assert head in ("dense", "splade")
        assert similarity in ("cos_sim", "dot_score")
        self.cfg = cfg
        self.head = head
        self.pooling = pooling or ("max" if head == "splade" else "mean")
        if head == "splade":
            assert self.pooling in ("max", "sum")
        else:
            assert self.pooling in ("mean", "max", "cls")
        self.similarity = similarity
        self.pruning_topk = pruning_topk
        from fusion_tpu.models.xmod import XmodConfig, XmodEncoder, XmodEncoderWithMLM

        self._is_xmod = isinstance(cfg, XmodConfig)
        self._lang_idx = 0
        if self._is_xmod:
            self.module = XmodEncoderWithMLM(cfg) if head == "splade" else XmodEncoder(cfg)
            if params is None:
                dummy = jnp.ones((1, 4), dtype=jnp.int32)
                params = self.module.init(
                    jax.random.PRNGKey(seed), dummy, jnp.ones((1, 4), jnp.int32),
                    deterministic=True,
                )
        else:
            self.module = EncoderWithMLM(cfg) if head == "splade" else Encoder(cfg)
            if params is None:
                _, params = init_encoder_params(cfg, seed=seed, with_mlm=head == "splade")
        self.params = params
        tokenizer = tokenizer or WordHashTokenizer(vocab_size=cfg.vocab_size)
        self.text_encoder = TextEncoder(
            tokenizer,
            max_query_length=max_query_length,
            max_doc_length=max_doc_length,
            query_prefix=query_prefix,
            doc_prefix=doc_prefix,
            augment_query_to_maxlen=augment_query_to_maxlen,
            augment_doc_to_maxlen=augment_doc_to_maxlen,
            do_lowercase=do_lowercase,
        )
        self._encode_jit = None

    # ------------------------------------------------------------------
    # functional forward (used by training steps; params explicit)
    # ------------------------------------------------------------------
    def set_language(self, lang: str) -> "BiEncoder":
        """Pin the X-MOD language adapter (multilingual DPR/SPLADE trunks;
        reference imports ``prepare_xmod_for_finetuning`` in
        single_dense_biencoder.py:32)."""
        assert self._is_xmod, "set_language needs an X-MOD trunk"
        self._lang_idx = self.cfg.lang_index(lang)
        self._encode_jit = None  # lang is baked into the cached executable
        return self

    def _with_cfg(self, **changes) -> "BiEncoder":
        """Copy of this model with a replaced config and a rebuilt module
        (same params/tokenizer; the cached executable is dropped)."""
        import copy

        out = copy.copy(self)
        out.cfg = dataclasses.replace(self.cfg, **changes)
        if self._is_xmod:
            from fusion_tpu.models.xmod import XmodEncoder, XmodEncoderWithMLM

            out.module = (
                XmodEncoderWithMLM(out.cfg) if self.head == "splade"
                else XmodEncoder(out.cfg)
            )
        else:
            out.module = (
                EncoderWithMLM(out.cfg) if self.head == "splade" else Encoder(out.cfg)
            )
        out._encode_jit = None
        return out

    def quantized(self, mode: str = "int8") -> "BiEncoder":
        """Serving-speed view: same params/tokenizer, trunk dense matmuls on
        the dynamic int8 MXU path (encoder.int8_dot_general).  Use for the
        QUERY side at serving (the corpus index is built with the f32
        forward; the int8 corpus index is a separate, orthogonal knob) and
        measure retrieval overlap first.  Inference-only."""
        return self._with_cfg(quantize=mode)

    def with_attention(self, impl: str) -> "BiEncoder":
        """Serving-speed view with a different attention implementation
        (same params).  ``einsum_bf16`` keeps 2-byte attention buffers
        (~0.4 % softmax error) — the impl that won the rerank-stage
        measurement (BENCH_r04) — applied here to the QUERY encoders;
        measure retrieval overlap before deploying (the corpus index
        keeps the full-precision forward it was built with)."""
        if impl == getattr(self.cfg, "attention_impl", "einsum"):
            return self
        return self._with_cfg(attention_impl=impl)

    def embed_tokens(self, params, input_ids, attention_mask, train: bool = False, rngs=None):
        """Token batch → embeddings [B, H] (dense) or [B, V] (splade)."""
        kw = {"lang_idx": self._lang_idx} if self._is_xmod else {}
        if self.head == "splade":
            _, logits = self.module.apply(
                params, input_ids, attention_mask, deterministic=not train, rngs=rngs, **kw
            )
            acts = heads.splade_activation(logits, attention_mask, self.pooling)
            if self.pruning_topk is not None and not train:
                acts, _ = heads.prune_topk(acts, self.pruning_topk)
            return acts
        hidden = self.module.apply(
            params, input_ids, attention_mask, deterministic=not train, rngs=rngs, **kw
        )
        return heads.pool(hidden, attention_mask, self.pooling)

    # ------------------------------------------------------------------
    # inference encode/search
    # ------------------------------------------------------------------
    def _get_encode_fn(self):
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda params, ids, mask: self.embed_tokens(params, ids, mask, train=False)
            )
        return self._encode_jit

    def encode(
        self,
        sentences: Sequence[str],
        query_mode: bool = True,
        batch_size: int = 32,
        convert_to_numpy: bool = True,
        sort_by_length: bool = False,
    ):
        """Encode texts in fixed-size batches (tail padded, then trimmed).

        ``sort_by_length=True`` groups inputs by approximate token length and
        pads each batch to the smallest power-of-two bucket, cutting encoder
        FLOPs on natural-length corpora (short docs stop paying for the full
        max_doc_length); output order is restored.
        """
        fn = self._get_encode_fn()
        n = len(sentences)
        if sort_by_length and n > batch_size:
            order = np.argsort([len(s.split()) for s in sentences], kind="stable")
        else:
            order = np.arange(n)
        max_len = (
            self.text_encoder.max_query_length
            if query_mode
            else self.text_encoder.max_doc_length
        )

        out = []
        # one-deep pipeline: fetch batch i only after dispatching i+1, so
        # host tokenization overlaps the device forward (same pattern as
        # serving.search; the per-batch fetch otherwise serializes them)
        pending = None
        for start in range(0, n, batch_size):
            sel = order[start : start + batch_size]
            chunk = [sentences[i] for i in sel]
            real = len(chunk)
            while len(chunk) < batch_size and n > batch_size:
                chunk.append("")
            ids, mask = self.text_encoder.encode(chunk, query_mode=query_mode)
            if sort_by_length:
                # bucket by TRIMMING trailing all-pad columns after full-width
                # tokenization — never by guessing token counts from word
                # counts (subword tokenizers exceed them, which would
                # silently truncate docs below max_doc_length and change the
                # embeddings vs the unbucketed path)
                real_w = int(np.asarray(mask).sum(axis=1).max()) or 1
                if real_w < ids.shape[1]:
                    w = 16
                    while w < real_w:
                        w *= 2
                    w = min(w, ids.shape[1])
                    ids, mask = ids[:, :w], mask[:, :w]
            embs = fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
            if pending is not None:
                out.append(np.asarray(pending[0])[: pending[1]])
            pending = (embs, real)
        if pending is not None:
            out.append(np.asarray(pending[0])[: pending[1]])
        embs = np.concatenate(out, axis=0) if out else np.zeros((0, 1), np.float32)
        if sort_by_length and n > batch_size:
            unsort = np.empty(n, dtype=np.int64)
            unsort[order] = np.arange(n)
            embs = embs[unsort]
        return embs if convert_to_numpy else jnp.asarray(embs)

    def search(
        self,
        queries: Sequence[str],
        documents: Sequence[str] | jax.Array,
        topk: int = 10,
        batch_size: int = 32,
        doc_block: int = 65536,
    ) -> RankedLists:
        """Brute-force exact search (reference splade/base.py:199-251), on
        device end-to-end.

        ``queries`` may be precomputed query embeddings (any array), letting
        callers time query encoding separately from scoring (the reference
        evaluator's latency split, sentence_transformers.py:323-381).
        """
        if isinstance(documents, (list, tuple)):
            d_embs = jnp.asarray(self.encode(documents, query_mode=False, batch_size=batch_size))
        else:
            d_embs = documents
        if isinstance(queries, (list, tuple)) and (not queries or isinstance(queries[0], str)):
            q_embs = jnp.asarray(self.encode(queries, query_mode=True, batch_size=batch_size))
        else:
            q_embs = jnp.asarray(queries)
        return dense_search(q_embs, d_embs, k=topk, similarity=self.similarity, doc_block=doc_block)

    # ------------------------------------------------------------------
    # learned-sparse index (SPLADE memory parity: pruned COO, not |V|-dense)
    # ------------------------------------------------------------------
    def build_sparse_index(
        self, documents: Sequence[str], prune_topk: int = 128, batch_size: int = 32
    ):
        """Prune each doc's activations to top-k and store COO on device."""
        assert self.head == "splade", "sparse index is for SPLADE models"
        from fusion_tpu.index.sparse import build_sparse_index

        def batches():
            for start in range(0, len(documents), batch_size):
                embs = self.encode(
                    documents[start : start + batch_size], query_mode=False, batch_size=batch_size
                )
                if self.similarity == "cos_sim":
                    norms = np.linalg.norm(embs, axis=-1, keepdims=True)
                    embs = embs / np.maximum(norms, 1e-12)
                yield embs

        return build_sparse_index(batches(), vocab_size=self.cfg.vocab_size, prune_topk=prune_topk)

    def search_sparse(
        self, queries: Sequence[str], index, topk: int = 1000, batch_size: int = 32
    ) -> RankedLists:
        from fusion_tpu.index.sparse import sparse_search
        from fusion_tpu.models.heads import l2_normalize

        q_embs = jnp.asarray(self.encode(queries, query_mode=True, batch_size=batch_size))
        if self.similarity == "cos_sim":
            q_embs = l2_normalize(q_embs)
        return sparse_search(q_embs, index, k=topk)

    # ------------------------------------------------------------------
    # persistence: config json (with version stamps, like the reference's
    # config_sparse_retrievers.json, base.py:331-342) + flax msgpack params
    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        config = {
            "head": self.head,
            "pooling": self.pooling,
            "similarity": self.similarity,
            "pruning_topk": self.pruning_topk,
            "max_query_length": self.text_encoder.max_query_length,
            "max_doc_length": self.text_encoder.max_doc_length,
            "query_prefix": self.text_encoder.query_prefix,
            "doc_prefix": self.text_encoder.doc_prefix,
            "augment_query_to_maxlen": self.text_encoder.augment_query_to_maxlen,
            "augment_doc_to_maxlen": self.text_encoder.augment_doc_to_maxlen,
            "do_lowercase": self.text_encoder.do_lowercase,
            # tokenizer identity: load() must reconstruct the SAME
            # tokenization — silently substituting the hash tokenizer for an
            # HF-trained model would make every query id meaningless
            "tokenizer": tokenization.tokenizer_config(self.text_encoder.tokenizer),
            "encoder": {
                k: (v if not hasattr(v, "dtype") else str(v))
                for k, v in dataclasses.asdict(self.cfg).items()
                if k != "dtype"
            },
            "__version__": {"fusion_tpu": fusion_tpu.__version__, "jax": jax.__version__},
        }
        with open(os.path.join(path, CONFIG_FILENAME), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.params))

    @classmethod
    def load(cls, path: str, tokenizer=None) -> "BiEncoder":
        from flax import serialization

        with open(os.path.join(path, CONFIG_FILENAME)) as f:
            config = json.load(f)
        if tokenizer is None:
            tokenizer = tokenization.tokenizer_from_config(config.get("tokenizer"))
        enc_cfg = dict(config["encoder"])
        if "languages" in enc_cfg:  # X-MOD trunk
            from fusion_tpu.models.xmod import XmodConfig

            enc_cfg["languages"] = tuple(enc_cfg["languages"])
            cfg = XmodConfig(**enc_cfg)
        else:
            cfg = EncoderConfig(**enc_cfg)
        model = cls(
            cfg,
            tokenizer=tokenizer,
            head=config["head"],
            pooling=config["pooling"],
            similarity=config["similarity"],
            pruning_topk=config["pruning_topk"],
            max_query_length=config["max_query_length"],
            max_doc_length=config["max_doc_length"],
            query_prefix=config["query_prefix"],
            doc_prefix=config["doc_prefix"],
            augment_query_to_maxlen=config["augment_query_to_maxlen"],
            augment_doc_to_maxlen=config["augment_doc_to_maxlen"],
            do_lowercase=config["do_lowercase"],
        )
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            from fusion_tpu.models.encoder import restore_params_bytes

            model.params = restore_params_bytes(model.params, f.read())
        return model

    def save_checkpoint(self, ckpt_dir: str, step: int, save_total_limit: int = 3) -> None:
        """Rolling step checkpoints (reference base.py:394-409)."""
        self.save(os.path.join(ckpt_dir, str(step)))
        existing = sorted(
            (int(d) for d in os.listdir(ckpt_dir) if d.isdigit()),
        )
        while save_total_limit and len(existing) > save_total_limit:
            shutil.rmtree(os.path.join(ckpt_dir, str(existing.pop(0))))

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained_hf(cls, model_name_or_path: str, head: str = "dense", **kw) -> "BiEncoder":
        """Build from a locally cached HuggingFace checkpoint."""
        from fusion_tpu.data.tokenization import HFTokenizer
        from fusion_tpu.models.encoder import load_hf_encoder_params

        cfg, params = load_hf_encoder_params(model_name_or_path)
        if head == "dense":
            # dense model only needs the trunk
            params = {"params": {"encoder": params["params"]["encoder"]}}
            # re-wrap: Encoder module expects top-level {embeddings, layer_i}
            params = {"params": params["params"]["encoder"]}
        tokenizer = HFTokenizer(model_name_or_path)
        return cls(cfg, params=params, tokenizer=tokenizer, head=head, **kw)

    @classmethod
    def from_xmod(
        cls,
        model_name_or_path: str,
        head: str = "dense",
        languages: Sequence[str] | None = None,
        lang: str = "fr",
        **kw,
    ) -> "BiEncoder":
        """Multilingual DPR/SPLADE on an X-MOD trunk: import the checkpoint
        (optionally subsetting adapters), pin ``lang``. SPLADE also imports
        the LM head (XmodForMaskedLM)."""
        from fusion_tpu.data.tokenization import HFTokenizer
        from fusion_tpu.models.xmod import load_hf_xmod_params

        cfg, hf_params = load_hf_xmod_params(
            model_name_or_path,
            languages=tuple(languages) if languages else None,
            with_mlm=head == "splade",
        )
        try:
            tokenizer = HFTokenizer(model_name_or_path)
        except Exception:
            tokenizer = None
        model = cls(cfg, params=hf_params, tokenizer=tokenizer, head=head, **kw)
        return model.set_language(lang)


def decode_splade_vector(
    activations: np.ndarray, tokenizer, topk_tokens: int = 96
) -> list[dict]:
    """Top-k activated vocabulary entries as a bag-of-words dict per row
    (reference splade.py:308-349)."""
    out = []
    acts = np.asarray(activations)
    for row in acts:
        idx = np.argsort(-row)[:topk_tokens]
        idx = idx[row[idx] > 0]
        weights = np.round(row[idx] * 100).astype(int)
        keep = weights > 0
        ids = idx[keep].tolist()
        ws = weights[keep].tolist()
        if hasattr(tokenizer, "tok"):
            toks = tokenizer.tok.convert_ids_to_tokens(ids)
        else:
            toks = [str(i) for i in ids]
        out.append(dict(zip(toks, ws)))
    return out
