"""Streaming production serving: online index updates + HTTP front door.

The reference's pipeline is an offline evaluation loop; this example shows
the deployment story this framework adds on top of full parity:

  1. build a hybrid searcher over an initial corpus,
  2. serve it over HTTP with dynamic batching (fusion_tpu/server.py),
  3. add / delete documents WHILE SERVING (fusion_tpu/segmented.py — only
     the delta is encoded; BM25 is rebuilt globally so idf stays exact),
  4. compact segments when the delta count grows.

Runs self-contained on CPU in ~1 min (tiny encoder, synthetic corpus):

    python -c "import jax; jax.config.update('jax_platforms','cpu'); \
               import runpy; runpy.run_path('examples/streaming_serving.py', \
               run_name='__main__')"
"""

import json
import urllib.request

import numpy as np


def main() -> None:
    from fusion_tpu.data.preprocessor import TextPreprocessor
    from fusion_tpu.models.biencoder import BiEncoder
    from fusion_tpu.models.encoder import EncoderConfig
    from fusion_tpu.segmented import SegmentedHybridSearcher
    from fusion_tpu.server import SearchServer

    words = (
        "chat chien tribunal jugement contrat travail loi consommateur "
        "voiture route oiseau foret tapis salon jardin souris fromage pain"
    ).split()
    rng = np.random.default_rng(0)

    def make_corpus(n, base_id):
        return {
            base_id + i: " ".join(rng.choice(words, size=6, replace=False))
            for i in range(n)
        }

    prep = TextPreprocessor(spacy_model=None)
    corpus = make_corpus(40, base_id=0)
    searcher = SegmentedHybridSearcher(
        corpus,
        bm25_docs=prep.preprocess(list(corpus.values())),
        dense_model=BiEncoder(
            EncoderConfig.tiny(vocab_size=1024),
            head="dense", max_query_length=8, max_doc_length=16,
        ),
        topk=10,
        batch_size=8,
        bm25_preprocess=lambda t: prep.preprocess(list(t)),
        int8_corpus=True,
    )
    print(f"built: systems={searcher.active_systems} docs={searcher.n_docs}")

    srv = SearchServer(searcher, port=0, max_batch=8, max_wait_ms=5.0)
    srv.start()
    host, port = srv.address
    base = f"http://{host}:{port}"

    def query(q):
        req = urllib.request.Request(
            f"{base}/search",
            data=json.dumps({"queries": [q], "topk": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())["results"][0]

    print("before add:", query("chat tapis salon"))

    # online update: only these 10 docs get encoded
    delta = make_corpus(10, base_id=1000)
    searcher.add_documents(delta, bm25_docs=prep.preprocess(list(delta.values())))
    after = query("chat tapis salon")
    print(f"after add (+10 docs, segments={len(searcher.segments)}):", after)

    searcher.delete_documents([after["ids"][0]])
    print("after deleting the top hit:", query("chat tapis salon"))

    searcher.compact()
    print(f"after compact (segments={len(searcher.segments)}):",
          query("chat tapis salon"))

    health = json.loads(urllib.request.urlopen(f"{base}/healthz", timeout=30).read())
    stats = json.loads(urllib.request.urlopen(f"{base}/stats", timeout=30).read())
    print("healthz:", health)
    print(f"stats: {stats['requests']} requests, {stats['batches']} device batches")
    srv.stop()


if __name__ == "__main__":
    main()
