"""Native (C++) host components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side hot loops that feed it are
C++: currently the BM25 posting builder (``bm25_builder.cpp``), compiled on
first use with g++ into a cached shared library.  Falls back to the pure
numpy builder when no compiler is available.
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
    src = os.path.join(_HERE, "bm25_builder.cpp")
    out = os.path.join(_BUILD_DIR, "libbm25_builder.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out]
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
