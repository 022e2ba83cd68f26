"""Mesh construction and sharding policy.

The reference's distributed surface is NCCL DDP around ColBERT plus
multiprocessing queues for the indexer (src/utils/colbert_ir.py:87-92,
175-181).  The TPU-native replacement is declarative: one
``jax.sharding.Mesh`` and PartitionSpecs — XLA inserts the collectives.

Axes:
  * ``data``  — batch dimension for training (gradient psum rides ICI; the
                reference splits batch per rank, colbert_ir.py:70-72)
  * ``model`` — tensor parallelism inside the encoder (attention heads and
                the FFN inner dim; not present in the reference but free to
                express here)
  * ``index`` — corpus-axis parallelism for serving: the corpus
                embedding/posting matrices shard over ``index``, each shard
                computes a local top-k and a tree all-gather merges (the
                reference's sequential 50k-doc chunking,
                sentence_transformers.py:334-367, turned into true
                parallelism)
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
INDEX_AXIS = "index"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    index: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model, index) mesh over the available devices.

    With ``data=None`` the data axis absorbs whatever devices remain after
    model×index are allocated.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (model * index) == 0, f"{n} devices not divisible by model*index"
        data = n // (model * index)
    assert data * model * index == n, (
        f"mesh {data}x{model}x{index} != {n} devices"
    )
    arr = np.array(devices).reshape(data, model, index)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS, INDEX_AXIS))


# ----------------------------------------------------------------------
# encoder tensor-parallel rules
# ----------------------------------------------------------------------
# path-regex → PartitionSpec; applied to the flax param tree. Attention
# projections shard over heads; FFN shards the inner dimension; embeddings
# shard the vocab rows. Everything else is replicated.
_ENCODER_TP_RULES: list[tuple[str, P]] = [
    # fused QKV kernel [H, 3, heads, hd]: heads shard over 'model'
    (r".*attention/qkv/kernel", P(None, None, MODEL_AXIS, None)),
    (r".*attention/qkv/bias", P(None, MODEL_AXIS, None)),
    (r".*attention/out/kernel", P(MODEL_AXIS, None, None)),
    (r".*attention/out/bias", P()),
    (r".*ffn_in/kernel", P(None, MODEL_AXIS)),
    (r".*ffn_in/bias", P(MODEL_AXIS)),
    (r".*ffn_out/kernel", P(MODEL_AXIS, None)),
    (r".*ffn_out/bias", P()),
    (r".*embeddings/word/embedding", P(None, None)),
    (r".*mlm/decoder/kernel", P(None, MODEL_AXIS)),
    (r".*mlm/decoder/bias", P(MODEL_AXIS)),
    (r".*", P()),
]


def encoder_param_spec(params) -> dict:
    """PartitionSpec tree matching a flax encoder param tree."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec_for(path) -> P:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        for pattern, spec in _ENCODER_TP_RULES:
            if re.fullmatch(pattern, key):
                return spec
        return P()

    specs = {jax.tree_util.keystr(path): spec_for(path) for path, _ in flat}
    # rebuild as a tree with same structure
    treedef = jax.tree_util.tree_structure(params)
    leaves = [spec_for(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh according to the TP rules."""
    specs = encoder_param_spec(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# ----------------------------------------------------------------------
# jitted shard_map program cache
# ----------------------------------------------------------------------
# jax.jit keys its trace cache on the function OBJECT; the standalone
# sharded ops (sharded_dense_search & co.) build their shard_map body as a
# closure, so wrapping it in jax.jit per call would re-trace and re-compile
# the whole mesh program on every invocation — seconds on CPU, minutes over
# a remote-compile tunnel.  They memoize the jitted program here instead,
# keyed on the mesh + every Python value the closure captures (shapes and
# dtypes are handled by jit's own cache).  Per-process, one entry per
# distinct serving configuration.
_PROGRAM_CACHE: dict = {}


def cached_shard_program(key: tuple, build):
    """Return the jitted program for ``key``, building it once via the
    zero-arg ``build`` callable (which should return the shard_map'd fn)."""
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = _PROGRAM_CACHE[key] = jax.jit(build())
    return prog


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, *trailing: str | None):
    """Batch-major sharding: first dim over 'data', rest as given."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing))


def index_sharding(mesh: Mesh, *trailing: str | None):
    """Corpus-major sharding: first dim over 'index'."""
    return NamedSharding(mesh, P(INDEX_AXIS, *trailing))
