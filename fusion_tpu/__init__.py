"""fusion_tpu — a TPU-native hybrid retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
maastrichtlawtech/fusion reference (see SURVEY.md): five retrieval systems
(BM25, DPR, SPLADE, ColBERT, monoBERT) plus rank fusion (Borda / RRF /
normalized convex score fusion), training (InfoNCE, MarginMSE, KLD, FLOPS
regularizers; AdamW / Adafactor / Shampoo), hard-negative mining, and a
vectorized IR evaluation suite.

Design principles (TPU-first, not a port):
  * ranked lists are fixed-shape ``(ids int32[Q,K], scores f32[Q,K])`` device
    arrays end-to-end — never Python list-of-dicts;
  * all corpus-scale scoring runs on device: BM25 as a gathered
    impact-segment-sum / blocked SpMM, dense retrieval as tiled MXU matmul with
    streaming top-k, ColBERT late interaction as a MaxSim kernel;
  * one metrics implementation (the reference has three);
  * parallelism via a ``jax.sharding.Mesh`` with axes ``('data', 'index')``:
    training shards the batch over ``data``; serving shards the corpus over
    ``index`` with per-shard top-k and an all-gather merge.
"""

__version__ = "0.1.0"

from fusion_tpu.core.ranked import RankedLists, PAD_ID

# Heavier public classes resolve lazily so `import fusion_tpu` stays cheap.
_LAZY = {
    "BM25Index": "fusion_tpu.models.bm25",
    "BiEncoder": "fusion_tpu.models.biencoder",
    "ColBERT": "fusion_tpu.models.colbert",
    "CrossEncoder": "fusion_tpu.models.crossencoder",
    "T5CrossEncoder": "fusion_tpu.models.t5",
    "EncoderConfig": "fusion_tpu.models.encoder",
    "Aggregator": "fusion_tpu.fusion.aggregator",
    "HybridPipeline": "fusion_tpu.hybrid",
    "HybridSearcher": "fusion_tpu.serving",
    "SegmentedHybridSearcher": "fusion_tpu.segmented",
    "SearchServer": "fusion_tpu.server",
    "Metrics": "fusion_tpu.eval.metrics",
    "InformationRetrievalEvaluator": "fusion_tpu.eval.evaluators",
    "RerankingEvaluator": "fusion_tpu.eval.evaluators",
    # index forms
    "ImpactIndex": "fusion_tpu.index.inverted",
    "ChunkedImpactIndex": "fusion_tpu.index.inverted",
    "scatter_impact_search": "fusion_tpu.ops.scatter_score",
    "SparseIndex": "fusion_tpu.index.sparse",
    "QuantizedDenseIndex": "fusion_tpu.index.dense_quant",
    "CompressedTokenIndex": "fusion_tpu.index.compression",
    "IVFIndex": "fusion_tpu.index.plaid",
    # multilingual trunk
    "XmodConfig": "fusion_tpu.models.xmod",
    "XmodEncoder": "fusion_tpu.models.xmod",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["RankedLists", "PAD_ID", "__version__", *sorted(_LAZY)]
