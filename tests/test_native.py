"""Native C++ BM25 builder: parity with the numpy path."""

import numpy as np
import pytest

from fusion_tpu.models.bm25 import BM25Index
from fusion_tpu.native import build_bm25_postings, native_available

CORPUS = [
    "le chat noir dort sur le tapis",
    "le chien aboie dans le jardin",
    "un chat et un chien jouent",
    "",
    "chat chat chat partout",
]


pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_native_matches_python_builder():
    py_idx = BM25Index.build(CORPUS, k1=1.5, b=0.75, use_native=False)
    nat_idx = BM25Index.build(CORPUS, k1=1.5, b=0.75, use_native=True)
    assert nat_idx.vocab == py_idx.vocab
    assert nat_idx.nnz == py_idx.nnz
    np.testing.assert_array_equal(np.asarray(nat_idx.entry_term), np.asarray(py_idx.entry_term))
    np.testing.assert_array_equal(np.asarray(nat_idx.entry_doc), np.asarray(py_idx.entry_doc))
    np.testing.assert_array_equal(np.asarray(nat_idx.entry_tf), np.asarray(py_idx.entry_tf))
    np.testing.assert_array_equal(np.asarray(nat_idx.doc_len), np.asarray(py_idx.doc_len))
    np.testing.assert_allclose(np.asarray(nat_idx.idf), np.asarray(py_idx.idf), rtol=1e-6)

    queries = ["chat noir", "chien jardin", "inconnu"]
    r1 = py_idx.search_all(queries, top_k=5)
    r2 = nat_idx.search_all(queries, top_k=5)
    np.testing.assert_array_equal(np.asarray(r1.ids), np.asarray(r2.ids))
    np.testing.assert_allclose(np.asarray(r1.scores), np.asarray(r2.scores), rtol=1e-6)


def test_native_raw_outputs():
    out = build_bm25_postings(["a b a", "b c"])
    vocab, et, ed, tf, dl, df = out
    assert vocab == {"a": 0, "b": 1, "c": 2}
    assert ed.tolist() == [0, 0, 1, 1]
    assert et.tolist() == [0, 1, 1, 2]
    assert tf.tolist() == [2.0, 1.0, 1.0, 1.0]
    assert dl.tolist() == [3.0, 2.0]
    assert df.tolist() == [1, 2, 1]


def test_native_unicode_terms():
    out = build_bm25_postings(["café protégé", "café"])
    vocab, et, ed, tf, dl, df = out
    assert "café" in vocab and "protégé" in vocab
    assert df[vocab["café"]] == 2


def test_native_build_speed_at_scale(rng):
    # ~1.4M tokens: the native path must stay well under a second
    import time

    docs = [
        " ".join(f"t{t}" for t in rng.integers(0, 30000, size=70)) for _ in range(20000)
    ]
    t0 = time.perf_counter()
    out = build_bm25_postings(docs)
    dt = time.perf_counter() - t0
    assert out is not None
    assert dt < 5.0, f"native build too slow: {dt:.2f}s"


def test_force_native_with_newlines_raises():
    """use_native=True must never silently fall back: documents containing
    newlines break the builder's line-delimited wire format, so forcing the
    native path on them is an error, not a silent numpy build."""
    from fusion_tpu.models.bm25 import BM25Index

    with pytest.raises(RuntimeError, match="newline"):
        BM25Index.build(["ok doc", "bad\ndoc"], use_native=True)
    # auto mode silently uses the numpy path for the same corpus
    idx = BM25Index.build(["ok doc", "bad\ndoc"], use_native="auto")
    assert idx.n_docs == 2
