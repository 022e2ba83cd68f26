"""Native (C++) host components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side hot loops that feed it are
C++: the BM25 posting builder (``bm25_builder.cpp``) and the chunked-impact
index packer (``impact_packer.cpp`` — bounded per-group selection replacing
a ~30 GB global lexsort at mMARCO posting counts), compiled on first use
with g++ into one cached shared library.  Falls back to the pure numpy
builders when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_HERE, "_build")
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _compile() -> str | None:
    srcs = [
        os.path.join(_HERE, "bm25_builder.cpp"),
        os.path.join(_HERE, "impact_packer.cpp"),
    ]
    out = os.path.join(_BUILD_DIR, "libfusion_native.so")
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", *srcs, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return out
    except Exception as e:  # log WHY so a silent numpy fallback is diagnosable
        import logging

        detail = getattr(e, "stderr", b"") or b""
        logging.getLogger(__name__).warning(
            "native BM25 builder compile failed (%s): %s — using numpy fallback",
            type(e).__name__,
            detail.decode("utf-8", "replace")[:500] if isinstance(detail, bytes) else detail,
        )
        return None


def get_library():
    """Load (compiling if needed) the native library, or None."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        path = _compile()
        if path is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(path)
        lib.bm25_build.restype = ctypes.c_void_p
        lib.bm25_build.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        for fn in ("bm25_nnz", "bm25_vocab_size", "bm25_ndocs", "bm25_vocab_bytes"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.bm25_export.restype = None
        lib.bm25_export.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_char_p,
        ]
        lib.bm25_free.restype = None
        lib.bm25_free.argtypes = [ctypes.c_void_p]
        lib.pack_chunked_impact.restype = ctypes.c_int64
        lib.pack_chunked_impact.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
        ]
        lib.pack_flat_impact.restype = ctypes.c_int64
        lib.pack_flat_impact.argtypes = [
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return get_library() is not None


def build_bm25_postings(corpus: list[str]):
    """Native BM25 posting build over whitespace-token documents.

    Returns (vocab dict, entry_term i64, entry_doc i64, entry_tf f32,
    doc_len f32, df i64) — the same artifacts as the Python builder in
    fusion_tpu.models.bm25.BM25Index.build. Returns None when unavailable.
    """
    lib = get_library()
    if lib is None:
        return None
    blob = "\n".join(corpus).encode("utf-8")
    handle = lib.bm25_build(blob, len(blob))
    try:
        nnz = lib.bm25_nnz(handle)
        v = lib.bm25_vocab_size(handle)
        n = lib.bm25_ndocs(handle)
        vbytes = lib.bm25_vocab_bytes(handle)
        entry_term = np.empty(nnz, dtype=np.int32)
        entry_doc = np.empty(nnz, dtype=np.int32)
        entry_tf = np.empty(nnz, dtype=np.float32)
        doc_len = np.empty(n, dtype=np.float32)
        df = np.empty(v, dtype=np.int64)
        vocab_buf = ctypes.create_string_buffer(int(vbytes) + 1)
        lib.bm25_export(handle, entry_term, entry_doc, entry_tf, doc_len, df, vocab_buf)
        terms = vocab_buf.raw[: int(vbytes)].decode("utf-8").split("\n")[:v]
        vocab = {t: i for i, t in enumerate(terms)}
        return (
            vocab,
            entry_term.astype(np.int64),
            entry_doc.astype(np.int64),
            entry_tf,
            doc_len,
            df,
        )
    finally:
        lib.bm25_free(handle)


def pack_chunked_impact(
    entry_term: np.ndarray,
    entry_doc: np.ndarray,
    impacts: np.ndarray,
    vocab_size: int,
    n_docs: int,
    docs_per_chunk: int,
    cap_per_chunk: int,
):
    """Native top-cap_per_chunk selection per (term, doc-range chunk).

    Returns (post_doc uint16 [V+1, C, capc], post_imp float16 [V+1, C, capc],
    nnz_kept) — the ChunkedImpactIndex arrays — or None when the native
    library is unavailable.  One O(nnz·log capc) pass with bounded per-group
    min-heaps instead of the numpy builder's global lexsort."""
    lib = get_library()
    if lib is None:
        return None
    t = np.ascontiguousarray(entry_term, dtype=np.int64)
    d = np.ascontiguousarray(entry_doc, dtype=np.int64)
    v = np.ascontiguousarray(impacts, dtype=np.float32)
    num_chunks = -(-n_docs // docs_per_chunk)
    shape = (vocab_size + 1, num_chunks, cap_per_chunk)
    post_doc = np.empty(shape, dtype=np.uint16)
    post_imp_bits = np.empty(shape, dtype=np.uint16)
    kept = lib.pack_chunked_impact(
        t, d, v, t.size, vocab_size, n_docs, docs_per_chunk, cap_per_chunk,
        post_doc.reshape(-1), post_imp_bits.reshape(-1),
    )
    if kept < 0:
        raise ValueError(
            "pack_chunked_impact: term/doc out of range or invalid chunking "
            f"(vocab_size={vocab_size}, n_docs={n_docs}, "
            f"docs_per_chunk={docs_per_chunk})"
        )
    return post_doc, post_imp_bits.view(np.float16), int(kept)


def pack_flat_impact(
    entry_term: np.ndarray,
    entry_doc: np.ndarray,
    impacts: np.ndarray,
    vocab_size: int,
    n_docs: int,
    cap: int,
):
    """Native top-cap selection per term (the flat ImpactIndex layout).

    Returns (post_doc int32 [V+1, cap], post_imp float16 [V+1, cap],
    nnz_kept) or None when the native library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    t = np.ascontiguousarray(entry_term, dtype=np.int64)
    d = np.ascontiguousarray(entry_doc, dtype=np.int64)
    v = np.ascontiguousarray(impacts, dtype=np.float32)
    post_doc = np.empty((vocab_size + 1, cap), dtype=np.int32)
    post_imp_bits = np.empty((vocab_size + 1, cap), dtype=np.uint16)
    kept = lib.pack_flat_impact(
        t, d, v, t.size, vocab_size, n_docs, cap,
        post_doc.reshape(-1), post_imp_bits.reshape(-1),
    )
    if kept < 0:
        raise ValueError(
            "pack_flat_impact: term/doc out of range "
            f"(vocab_size={vocab_size}, n_docs={n_docs})"
        )
    return post_doc, post_imp_bits.view(np.float16), int(kept)
