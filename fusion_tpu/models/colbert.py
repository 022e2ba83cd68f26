"""ColBERT late-interaction retriever.

TPU-native replacement for the reference's colbert-ai wrappers
(src/utils/colbert_ir.py:49-255, src/retrievers/multi_dense_biencoder.py):
per-token 128-d embeddings, query mask-augmentation, punctuation skiplist on
documents, MaxSim scoring via the Pallas kernel / blocked XLA path
(fusion_tpu/ops/maxsim.py), and a device-resident token index.

The reference's compressed index (faiss k-means centroids + 2-bit residuals)
is represented here by the ``TokenIndex`` abstraction; the uncompressed
bf16 token-matrix index is the default (bf16 halves memory vs the
reference's fp16 uncompressed baseline), with centroid/residual compression
as a follow-up index codec.
"""

from __future__ import annotations

import dataclasses
import json
import os
import string
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import fusion_tpu
from fusion_tpu.data import tokenization
from fusion_tpu.core.ranked import RankedLists
from fusion_tpu.data.tokenization import TextEncoder, WordHashTokenizer
from fusion_tpu.models.encoder import Encoder, EncoderConfig
from fusion_tpu.models.heads import ColBERTHead
from fusion_tpu.ops.maxsim import maxsim_search

CONFIG_FILENAME = "config_fusion_tpu.json"

_PUNCT = set(string.punctuation)


class ColBERTModule(nn.Module):
    """Trunk + projection head. ``cfg`` selects the trunk: a plain
    ``EncoderConfig`` → CamemBERT/RoBERTa encoder; an ``XmodConfig`` →
    X-MOD encoder with language-adapter routing (the reference trains
    multilingual ColBERT on X-MOD, colbert_ir.py:43,96-101)."""

    cfg: Any  # EncoderConfig | XmodConfig
    dim: int = 128

    @nn.compact
    def __call__(self, input_ids, attention_mask, lang_idx=0, deterministic=True):
        from fusion_tpu.models.xmod import XmodConfig, XmodEncoder

        if isinstance(self.cfg, XmodConfig):
            hidden = XmodEncoder(self.cfg, name="encoder")(
                input_ids, attention_mask, lang_idx, deterministic
            )
        else:
            hidden = Encoder(self.cfg, name="encoder")(
                input_ids, attention_mask, deterministic
            )
        return ColBERTHead(dim=self.dim, dtype=self.cfg.dtype, name="colbert")(
            hidden, attention_mask
        )


@dataclasses.dataclass
class TokenIndex:
    """Device-resident token-matrix index: [N, Ld, D] + [N, Ld] mask.

    ``prepared()`` caches the search layout (token-major, masked tokens
    zeroed, per-doc validity) so repeated query batches skip two
    full-corpus HBM rewrites (prepare_token_corpus)."""

    tokens: jax.Array
    mask: jax.Array
    _prepared: tuple | None = dataclasses.field(
        default=None, repr=False, compare=False
    )

    @property
    def num_docs(self) -> int:
        return self.tokens.shape[0]

    def prepared(self) -> tuple[jax.Array, jax.Array]:
        """(corpus_tm [Ld, N, D] bf16 zeroed, doc_valid [N] bool)."""
        if self._prepared is None:
            from fusion_tpu.ops.maxsim import prepare_token_corpus

            out = jax.jit(prepare_token_corpus)(self.tokens, self.mask)
            if any(isinstance(o, jax.core.Tracer) for o in out):
                # first call happened inside an outer jit trace: return the
                # staged values but never cache tracers
                return out
            self._prepared = out
        return self._prepared

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez_compressed(
            os.path.join(path, "token_index.npz"),
            tokens=np.asarray(self.tokens, dtype=np.float16),
            mask=np.asarray(self.mask, dtype=np.int8),
        )

    @classmethod
    def load(cls, path: str) -> "TokenIndex":
        data = np.load(os.path.join(path, "token_index.npz"))
        return cls(
            tokens=jnp.asarray(data["tokens"]).astype(jnp.bfloat16),
            mask=jnp.asarray(np.asarray(data["mask"], dtype=np.float32)),
        )


class ColBERT:
    """Late-interaction bi-encoder with token-level MaxSim."""

    def __init__(
        self,
        cfg: EncoderConfig,
        params: Any = None,
        tokenizer=None,
        dim: int = 128,
        max_query_length: int = 32,
        max_doc_length: int = 128,
        mask_punctuation: bool = True,
        seed: int = 42,
    ):
        self.cfg = cfg
        self.dim = dim
        self.mask_punctuation = mask_punctuation
        self.module = ColBERTModule(cfg, dim=dim)
        if params is None:
            dummy = jnp.ones((1, 4), dtype=jnp.int32)
            params = self.module.init(
                jax.random.PRNGKey(seed), dummy, jnp.ones((1, 4), jnp.int32), deterministic=True
            )
        self.params = params
        tokenizer = tokenizer or WordHashTokenizer(vocab_size=cfg.vocab_size)
        # ColBERT-style query augmentation: pad → [MASK], attended
        self.text_encoder = TextEncoder(
            tokenizer,
            max_query_length=max_query_length,
            max_doc_length=max_doc_length,
            augment_query_to_maxlen=True,
        )
        self._encode_jit = None
        self._punct_ids = self._punctuation_token_ids(tokenizer)
        self._lang_idx = 0  # X-MOD adapter routing (no-op for plain trunks)

    def set_language(self, lang: str) -> "ColBERT":
        """Pin the X-MOD language adapter (reference ``set_xmod_language``;
        fusion_tpu/utils/xmod.py is the torch-side counterpart)."""
        assert hasattr(self.cfg, "lang_index"), "set_language needs an X-MOD trunk"
        self._lang_idx = self.cfg.lang_index(lang)
        self._encode_jit = None  # lang is baked into the cached executable
        return self

    @staticmethod
    def _punctuation_token_ids(tokenizer) -> set[int]:
        """Token ids whose surface form is pure punctuation (the colbert-ai
        document skiplist)."""
        ids: set[int] = set()
        if hasattr(tokenizer, "tok"):
            vocab = tokenizer.tok.get_vocab()
            for tok, tid in vocab.items():
                stripped = tok.lstrip("Ġ▁")
                if stripped and all(c in _PUNCT for c in stripped):
                    ids.add(tid)
        elif isinstance(tokenizer, WordHashTokenizer):
            for ch in string.punctuation:
                ids.update(tokenizer.token_ids(ch))
        return ids

    def _with_cfg(self, **changes) -> "ColBERT":
        """Copy with a replaced config and rebuilt module (same params)."""
        import copy
        import dataclasses as _dc

        out = copy.copy(self)
        out.cfg = _dc.replace(self.cfg, **changes)
        out.module = ColBERTModule(out.cfg, dim=self.dim)
        out._encode_jit = None
        return out

    def quantized(self, mode: str = "int8") -> "ColBERT":
        """Serving-speed view: trunk dense matmuls on the dynamic int8 MXU
        path (X-MOD trunks included; their bottleneck adapters stay f32);
        same params/tokenizer.  Query-side serving only — index with the
        f32 forward and measure overlap first.  Inference-only."""
        return self._with_cfg(quantize=mode)

    def with_attention(self, impl: str) -> "ColBERT":
        """Serving-speed view with a different attention impl (same
        params); see BiEncoder.with_attention for the measured trade."""
        if impl == getattr(self.cfg, "attention_impl", "einsum"):
            return self
        return self._with_cfg(attention_impl=impl)

    # ------------------------------------------------------------------
    def embed_tokens(self, params, input_ids, attention_mask, train: bool = False, rngs=None):
        return self.module.apply(
            params, input_ids, attention_mask,
            lang_idx=self._lang_idx, deterministic=not train, rngs=rngs,
        )

    @staticmethod
    def pairwise_maxsim(q_tok, q_mask, d_tok, d_mask) -> jax.Array:
        """Aligned MaxSim: query i vs doc i → [B]."""
        sim = jnp.einsum("bid,bjd->bij", q_tok, d_tok, preferred_element_type=jnp.float32)
        sim = jnp.where(d_mask[:, None, :] > 0, sim, -1e9)
        best = sim.max(axis=-1) * q_mask
        return best.sum(axis=-1)

    @staticmethod
    def nway_maxsim(q_tok, q_mask, d_tok, d_mask) -> jax.Array:
        """Batched n-way MaxSim: query i vs its n docs → [B, N].

        One [B, Lq, D] × [B, N·Ld, D] batched matmul (the MXU form) instead
        of a vmap-of-vmap of pairwise calls — at the reference's training
        scale (bs=128, n-way 8, doc 256; colbert_ir.py:116-165) the nested
        vmap lowers to per-negative small matmuls that underfill the MXU.
        """
        b, n, ld, d = d_tok.shape
        sim = jnp.einsum(
            "bqd,bnld->bnql", q_tok, d_tok, preferred_element_type=jnp.float32
        )
        sim = jnp.where(d_mask[:, :, None, :] > 0, sim, -1e9)
        best = sim.max(axis=-1)  # [B, N, Lq]
        return (best * q_mask[:, None, :]).sum(axis=-1)

    # ------------------------------------------------------------------
    def _get_encode_fn(self):
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda params, ids, mask: self.embed_tokens(params, ids, mask, train=False)
            )
        return self._encode_jit

    def _encode_texts(self, texts: Sequence[str], query_mode: bool, batch_size: int):
        fn = self._get_encode_fn()
        toks, masks = [], []
        # one-deep pipeline: fetch batch i after dispatching i+1 so host
        # tokenization overlaps the device forward (see BiEncoder.encode)
        pending = None
        for start in range(0, len(texts), batch_size):
            chunk = list(texts[start : start + batch_size])
            real = len(chunk)
            while len(chunk) < batch_size and len(texts) > batch_size:
                chunk.append("")
            ids, mask = self.text_encoder.encode(chunk, query_mode=query_mode)
            if not query_mode and self.mask_punctuation and self._punct_ids:
                punct = np.isin(ids, list(self._punct_ids))
                mask = np.where(punct, 0, mask)
            embs = fn(self.params, jnp.asarray(ids), jnp.asarray(mask))
            if pending is not None:
                p_embs, p_mask, p_real = pending
                toks.append(np.asarray(p_embs)[:p_real])
                masks.append(p_mask[:p_real])
            pending = (embs, np.asarray(mask), real)
        if pending is not None:
            p_embs, p_mask, p_real = pending
            toks.append(np.asarray(p_embs)[:p_real])
            masks.append(p_mask[:p_real])
        return np.concatenate(toks, axis=0), np.concatenate(masks, axis=0)

    def encode_queries(self, queries: Sequence[str], batch_size: int = 32):
        return self._encode_texts(queries, query_mode=True, batch_size=batch_size)

    # ------------------------------------------------------------------
    def index(
        self, documents: Sequence[str], batch_size: int = 32, pad_docs_to: int = 128
    ) -> TokenIndex:
        """Encode the collection into a token-matrix index (bf16 on device).

        ``pad_docs_to`` rounds the doc count up so MaxSim blocks tile evenly.
        """
        toks, masks = self._encode_texts(documents, query_mode=False, batch_size=batch_size)
        n = toks.shape[0]
        n_pad = -(-max(n, 1) // pad_docs_to) * pad_docs_to
        if n_pad > n:
            toks = np.pad(toks, ((0, n_pad - n), (0, 0), (0, 0)))
            masks = np.pad(masks, ((0, n_pad - n), (0, 0)))
        return TokenIndex(
            tokens=jnp.asarray(toks, dtype=jnp.bfloat16),
            mask=jnp.asarray(masks, dtype=jnp.float32),
        )

    def index_compressed(
        self,
        documents: Sequence[str],
        batch_size: int = 32,
        pad_docs_to: int = 128,
        nbits: int = 2,
        kmeans_iters: int = 4,
        num_centroids: int | None = None,
        dma_codes: bool = False,
    ):
        """Residual-compressed index (reference nbits=2, kmeans_niters=4,
        run_colbert.sh:34-36) — ~7x smaller than the bf16 token matrix."""
        from fusion_tpu.index.compression import compress_token_index

        raw = self.index(documents, batch_size=batch_size, pad_docs_to=pad_docs_to)
        return compress_token_index(
            raw.tokens.astype(jnp.float32),
            raw.mask,
            nbits=nbits,
            kmeans_iters=kmeans_iters,
            num_centroids=num_centroids,
            dma_codes=dma_codes,
        )

    def search(
        self,
        queries: Sequence[str],
        index,
        k: int = 1000,
        batch_size: int = 32,
        doc_block: int = 1024,
        use_pallas: bool = True,
    ) -> RankedLists:
        if isinstance(queries, tuple) and len(queries) == 2 and not isinstance(queries[0], str):
            q_tok, q_mask = queries  # precomputed (tokens, mask) — lets callers
            # time query encoding separately (reference latency split,
            # sentence_transformers.py:323-381)
        else:
            q_tok, q_mask = self.encode_queries(queries, batch_size=batch_size)
        q_tok = jnp.asarray(q_tok)
        q_mask = jnp.asarray(np.asarray(q_mask).astype(np.float32))
        if not isinstance(index, TokenIndex):  # CompressedTokenIndex
            from fusion_tpu.index.compression import maxsim_search_compressed

            return maxsim_search_compressed(
                q_tok, q_mask, index, k=k,
                doc_block=doc_block if doc_block != 1024 else 8192,
                use_pallas=use_pallas and jax.default_backend() == "tpu",
            )
        if use_pallas:
            corpus_tm, doc_valid = index.prepared()
            from fusion_tpu.ops.maxsim import maxsim_search_tm

            # gate the kernel on the backend like the compressed branch —
            # the tm form's XLA fallback has identical zeromask semantics
            return maxsim_search_tm(
                q_tok, q_mask, corpus_tm, doc_valid, k=k,
                use_pallas=jax.default_backend() == "tpu",
            )
        return maxsim_search(
            q_tok,
            q_mask,
            index.tokens.astype(jnp.float32),
            index.mask,
            k=k,
            doc_block=doc_block,
            use_pallas=False,
        )

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        from flax import serialization
        import dataclasses

        os.makedirs(path, exist_ok=True)
        config = {
            "model_type": "colbert",
            "dim": self.dim,
            "mask_punctuation": self.mask_punctuation,
            "max_query_length": self.text_encoder.max_query_length,
            "max_doc_length": self.text_encoder.max_doc_length,
            "tokenizer": tokenization.tokenizer_config(self.text_encoder.tokenizer),
            "encoder": {k: v for k, v in dataclasses.asdict(self.cfg).items() if k != "dtype"},
            "__version__": {"fusion_tpu": fusion_tpu.__version__, "jax": jax.__version__},
        }
        with open(os.path.join(path, CONFIG_FILENAME), "w") as f:
            json.dump(config, f, indent=2)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.params))

    @classmethod
    def from_pretrained_hf(
        cls, model_name_or_path: str, dim: int = 128, seed: int = 42, **kw
    ) -> "ColBERT":
        """Trunk weights from a locally cached HF checkpoint; the projection
        head is freshly initialized (as when starting ColBERT training from
        a plain LM checkpoint)."""
        from fusion_tpu.data.tokenization import HFTokenizer
        from fusion_tpu.models.encoder import load_hf_encoder_params

        cfg, hf_params = load_hf_encoder_params(model_name_or_path)
        try:
            tokenizer = HFTokenizer(model_name_or_path)
        except Exception:  # checkpoint without tokenizer files
            tokenizer = None
        model = cls(cfg, tokenizer=tokenizer, dim=dim, seed=seed, **kw)
        params = jax.tree_util.tree_map(lambda x: x, model.params)  # copy structure
        params["params"]["encoder"] = hf_params["params"]["encoder"]
        model.params = params
        return model

    @classmethod
    def from_xmod(
        cls,
        model_name_or_path: str,
        languages: Sequence[str] | None = None,
        lang: str = "fr",
        dim: int = 128,
        seed: int = 42,
        **kw,
    ) -> "ColBERT":
        """Multilingual ColBERT on an X-MOD trunk (reference recipe,
        colbert_ir.py:43,96-101): import the checkpoint (optionally
        subsetting adapters to ``languages``), pin ``lang``, fresh head.
        Train with ``xmod_finetune_labels`` to freeze embeddings+adapters."""
        from fusion_tpu.data.tokenization import HFTokenizer
        from fusion_tpu.models.xmod import load_hf_xmod_params

        cfg, hf_params = load_hf_xmod_params(
            model_name_or_path, languages=tuple(languages) if languages else None
        )
        try:
            tokenizer = HFTokenizer(model_name_or_path)
        except Exception:
            tokenizer = None
        model = cls(cfg, tokenizer=tokenizer, dim=dim, seed=seed, **kw)
        params = jax.tree_util.tree_map(lambda x: x, model.params)
        params["params"]["encoder"] = hf_params["params"]
        model.params = params
        return model.set_language(lang)

    @classmethod
    def load(cls, path: str, tokenizer=None) -> "ColBERT":
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
            dim=config["dim"],
            max_query_length=config["max_query_length"],
            max_doc_length=config["max_doc_length"],
            mask_punctuation=config["mask_punctuation"],
        )
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            from fusion_tpu.models.encoder import restore_params_bytes

            model.params = restore_params_bytes(model.params, f.read())
        return model
