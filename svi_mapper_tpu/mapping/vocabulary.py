"""Binary bag-of-words vocabulary: hierarchical k-medians over BRIEF bits.

TPU-native analog of the reference's DBoW2 place-recognition path: the
reference builds a branching-factor-10, depth-6 BRIEF vocabulary offline
(``create_vocabulary_dbow2.cpp``, vocab file loaded at ``CTrackerGT.cpp:39``)
and queries a ``BriefDatabase`` per keyframe (``CTrackerGT.cpp:411``) before
descriptor-level matching. Here the tree is built as *batched level-wise
k-medians on device* — every node of a level is clustered simultaneously via
segment sums over unpacked bit planes (no per-node recursion) — and lookup is
a vectorized descent: at each level one gather of the current node's ``k``
centroids plus an XOR-popcount argmin over the whole descriptor batch.

BoW vectors are dense ``[k**levels]`` TF-IDF histograms (default 8^4 = 4096
words), so database scoring is a single ``[K, W]`` broadcast L1 reduction —
MXU/VPU-friendly, no inverted-file pointer chasing. Scoring uses the DBoW2
L1 norm: ``s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1``.

This is the *optional* shortlist path for :func:`mapping.closure.find_closures`
(the exact all-pairs pool scoring stays the default; the native C++
DescriptorIndex is the second alternative — mirroring the reference's
``USING_BOW`` compile switch, ``CTrackerSV.h:111-113``).
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from svi_mapper_tpu.ops.descriptors import pack_bits, unpack_bits

_BIG = jnp.int32(1 << 20)


# ---------------------------------------------------------------------------
# vocabulary container
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Vocabulary:
    """A depth-``levels`` branching-``k`` binary vocabulary.

    ``centroids[l]`` is ``[k**l, k, 8]`` uint32: the ``k`` child centroids of
    every level-``l`` node. ``child_valid[l]`` masks children that received
    training descriptors. ``weights`` is ``[k**levels]`` float32 idf.
    """

    k: int
    levels: int
    centroids: tuple  # of jax.Array [k**l, k, 8] uint32
    child_valid: tuple  # of jax.Array [k**l, k] bool
    weights: jax.Array  # [k**levels] float32

    @property
    def num_words(self) -> int:
        return self.k ** self.levels


def save_vocabulary(path: str | Path, vocab: Vocabulary) -> None:
    arrs = {"k": np.int64(vocab.k), "levels": np.int64(vocab.levels),
            "weights": np.asarray(vocab.weights)}
    for l in range(vocab.levels):
        arrs[f"cent{l}"] = np.asarray(vocab.centroids[l])
        arrs[f"valid{l}"] = np.asarray(vocab.child_valid[l])
    np.savez_compressed(path, **arrs)


def load_vocabulary(path: str | Path) -> Vocabulary:
    z = np.load(path)
    k, levels = int(z["k"]), int(z["levels"])
    return Vocabulary(
        k=k, levels=levels,
        centroids=tuple(jnp.asarray(z[f"cent{l}"]) for l in range(levels)),
        child_valid=tuple(jnp.asarray(z[f"valid{l}"]) for l in range(levels)),
        weights=jnp.asarray(z["weights"]),
    )


# ---------------------------------------------------------------------------
# build: level-wise batched k-medians
# ---------------------------------------------------------------------------

def _assign(desc: jax.Array, node: jax.Array, cent: jax.Array,
            cvalid: jax.Array) -> jax.Array:
    """[N] argmin_child popcount(desc ^ cent[node])."""
    c = cent[node]                                   # [N, k, 8]
    d = jnp.sum(jax.lax.population_count(desc[:, None, :] ^ c), axis=-1)
    d = jnp.where(cvalid[node], d.astype(jnp.int32), _BIG)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_nodes", "k", "iters"))
def _kmedians_level(desc, bits, node, init_cent, num_nodes: int, k: int,
                    iters: int):
    """Cluster every node of one level simultaneously.

    desc [N,8] uint32, bits [N,256] float32 (unpacked desc), node [N] int32
    current node id. Returns (assign [N], cent [num_nodes,k,8],
    cvalid [num_nodes,k]).
    """
    nseg = num_nodes * k
    ones = jnp.ones((desc.shape[0],), jnp.float32)

    def step(cent, _):
        cvalid = jnp.ones((num_nodes, k), bool)
        a = _assign(desc, node, cent, cvalid)
        seg = node * k + a
        bitsum = jax.ops.segment_sum(bits, seg, num_segments=nseg)   # [nseg,256]
        cnt = jax.ops.segment_sum(ones, seg, num_segments=nseg)      # [nseg]
        maj = (2.0 * bitsum) > cnt[:, None]                          # bit majority
        new = pack_bits(maj).reshape(num_nodes, k, 8)
        keep = (cnt.reshape(num_nodes, k) > 0)[..., None]
        cent = jnp.where(keep, new, cent)
        return cent, None

    cent, _ = jax.lax.scan(step, init_cent, None, length=iters)
    cvalid_all = jnp.ones((num_nodes, k), bool)
    a = _assign(desc, node, cent, cvalid_all)
    cnt = jax.ops.segment_sum(ones, node * k + a, num_segments=nseg)
    cvalid = cnt.reshape(num_nodes, k) > 0
    return a, cent, cvalid


def build_vocabulary(
    desc: np.ndarray,
    *,
    k: int = 8,
    levels: int = 4,
    iters: int = 8,
    seed: int = 0,
    doc_ids: np.ndarray | None = None,
) -> Vocabulary:
    """Train a vocabulary from packed descriptors ``[N, 8]`` uint32.

    ``doc_ids`` (``[N]`` int, optional) groups descriptors into "documents"
    (images/keyframes) for idf weighting ``log(n_docs / df_w)``; without it
    all word weights are 1 (DBoW2's TF_IDF falls back the same way when
    trained without document structure).
    """
    desc = np.ascontiguousarray(desc, np.uint32)
    n = len(desc)
    if n < k:
        raise ValueError(f"need at least k={k} descriptors, got {n}")
    rng = np.random.default_rng(seed)
    desc_j = jnp.asarray(desc)
    bits = unpack_bits(desc_j).astype(jnp.float32)
    node = np.zeros(n, np.int32)

    centroids, child_valid = [], []
    for level in range(levels):
        num_nodes = k ** level
        # init: k distinct members per node (host side — cheap, once per level)
        init = np.zeros((num_nodes, k, 8), np.uint32)
        order = np.argsort(node, kind="stable")
        sorted_nodes = node[order]
        starts = np.searchsorted(sorted_nodes, np.arange(num_nodes))
        ends = np.searchsorted(sorted_nodes, np.arange(num_nodes) + 1)
        for s_node in range(num_nodes):
            members = order[starts[s_node]:ends[s_node]]
            if len(members) == 0:
                init[s_node] = desc[rng.integers(0, n, size=k)]
            else:
                pick = rng.choice(members, size=k, replace=len(members) < k)
                init[s_node] = desc[pick]
        a, cent, cvalid = _kmedians_level(
            desc_j, bits, jnp.asarray(node), jnp.asarray(init),
            num_nodes=num_nodes, k=k, iters=iters,
        )
        centroids.append(cent)
        child_valid.append(cvalid)
        node = np.asarray(node * k + np.asarray(a), np.int32)

    num_words = k ** levels
    if doc_ids is not None:
        doc_ids = np.asarray(doc_ids)
        n_docs = len(np.unique(doc_ids))
        pairs = np.unique(np.stack([node, doc_ids.astype(np.int64)], 1), axis=0)
        df = np.bincount(pairs[:, 0].astype(np.int64), minlength=num_words)
        weights = np.where(df > 0, np.log(n_docs / np.maximum(df, 1)), 0.0)
        # words seen in every doc get idf 0; keep a tiny floor so they still count
        weights = np.maximum(weights, 1e-3 * (df > 0))
    else:
        weights = np.ones(num_words)
    return Vocabulary(
        k=k, levels=levels, centroids=tuple(centroids),
        child_valid=tuple(child_valid),
        weights=jnp.asarray(weights, jnp.float32),
    )


# ---------------------------------------------------------------------------
# lookup + BoW vectors
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "levels"))
def _descend(centroids: tuple, child_valid: tuple, desc: jax.Array, k: int,
             levels: int | None = None):
    node = jnp.zeros(desc.shape[0], jnp.int32)
    stop = len(centroids) if levels is None else levels
    for cent, cv in zip(centroids[:stop], child_valid[:stop]):
        a = _assign(desc, node, cent, cv)
        node = node * k + a
    return node


def word_ids(vocab: Vocabulary, desc: jax.Array) -> jax.Array:
    """Vectorized tree descent: packed descriptors ``[M, 8]`` -> word ids
    [M] (one fused dispatch)."""
    return _descend(vocab.centroids, vocab.child_valid, desc, vocab.k)


def node_ids(vocab: Vocabulary, desc: jax.Array, levels: int) -> jax.Array:
    """Vocabulary-node ids at tree level ``levels`` for each descriptor
    ``[M, 8]`` -> ``[M]`` int32.

    The direct-index key of DBoW2 (``DBOW2_ID_LEVELS 2``, set by the
    reference at CTrackerGT.cpp:38-39 and consumed via the database's
    per-node feature lists at :248-250): two features are correspondence
    candidates iff their descriptors descend through the same vocabulary
    node at this level. Here the inverted per-node feature lists become a
    per-descriptor node-id vector, and 'sharing a node' becomes an
    equality mask on the dense [P, P] Hamming matrix — the TPU-shaped
    direct index (no pointer-chased lists; one extra descent dispatch)."""
    return _descend(vocab.centroids, vocab.child_valid, desc, vocab.k,
                    levels=min(levels, vocab.levels))


@functools.partial(jax.jit, static_argnames=("k",))
def _bow_vector_jit(centroids, child_valid, weights, desc, tf, k: int):
    node = _descend(centroids, child_valid, desc, k)
    v = jnp.zeros(weights.shape[0], jnp.float32).at[node].add(tf)
    v = v * weights
    s = jnp.sum(v)
    return jnp.where(s > 0, v / s, v)


def bow_vector(vocab: Vocabulary, desc: jax.Array,
               valid: jax.Array | None = None) -> jax.Array:
    """TF-IDF BoW vector ``[num_words]`` float32, L1-normalized
    (one fused dispatch — dispatch latency dominates on a remote chip)."""
    tf = (jnp.ones(desc.shape[0], jnp.float32) if valid is None
          else valid.astype(jnp.float32))
    return _bow_vector_jit(vocab.centroids, vocab.child_valid, vocab.weights,
                           desc, tf, vocab.k)


@jax.jit
def score_l1(v: jax.Array, db: jax.Array) -> jax.Array:
    """DBoW2 L1 score of one vector against a stack: ``[K]`` in [0, 1]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - v[None, :]), axis=-1)


class BowDatabase:
    """Dense BoW database: one L1 broadcast reduction scores all keyframes.

    Role of the reference's ``BriefDatabase`` (DBoW2) queried at
    ``CTrackerGT.cpp:411``; ``DBOW2_ID_LEVELS``-style direct index is not
    needed because descriptor-level matching runs as exact all-pairs Hamming
    downstream. Vectors live ON DEVICE so a query is one dispatch with no
    host->device vector traffic.
    """

    def __init__(self, vocab: Vocabulary, capacity: int = 1024):
        self.vocab = vocab
        self.vectors = jnp.zeros((capacity, vocab.num_words), jnp.float32)
        self.n = 0

    def add(self, desc: np.ndarray | jax.Array,
            valid: np.ndarray | jax.Array | None = None) -> int:
        if self.n >= self.vectors.shape[0]:     # grow (amortized O(1))
            self.vectors = jnp.concatenate(
                [self.vectors, jnp.zeros_like(self.vectors)])
        i = self.n
        self.vectors = _bow_add_jit(
            self.vocab.centroids, self.vocab.child_valid, self.vocab.weights,
            self.vectors, jnp.asarray(desc),
            (jnp.ones(np.shape(desc)[0], jnp.float32) if valid is None
             else jnp.asarray(valid).astype(jnp.float32)),
            jnp.int32(i), self.vocab.k,
        )
        self.n = i + 1
        return i

    def add_many(self, descs: np.ndarray,
                 valids: np.ndarray | None = None,
                 count: int | None = None) -> int:
        """Add keyframe pools ``[B, P, 8]`` in one batched dispatch
        (see `_bow_add_many_jit`); returns the first assigned index.

        ``count`` (default B) is how many leading rows are real — callers
        pad B to a power-of-two bucket so the program compiles once per
        bucket; pad rows (all-zero tf) write zero vectors into slots the
        next add overwrites."""
        B = int(np.shape(descs)[0])
        n_real = B if count is None else count
        if n_real == 0:
            return self.n
        while self.n + B > self.vectors.shape[0]:
            self.vectors = jnp.concatenate(
                [self.vectors, jnp.zeros_like(self.vectors)])
        i0 = self.n
        tfs = (np.ones(np.shape(descs)[:2], np.float32) if valids is None
               else np.asarray(valids, np.float32))
        self.vectors = _bow_add_many_jit(
            self.vocab.centroids, self.vocab.child_valid, self.vocab.weights,
            self.vectors, jnp.asarray(descs), jnp.asarray(tfs),
            jnp.int32(i0), self.vocab.k)
        self.n = i0 + n_real
        return i0

    def query(self, desc: np.ndarray | jax.Array,
              valid: np.ndarray | jax.Array | None = None) -> np.ndarray:
        """Scores ``[n]`` of a query pool against every stored keyframe."""
        if self.n == 0:
            return np.zeros(0, np.float32)
        v = bow_vector(self.vocab, jnp.asarray(desc),
                       None if valid is None else jnp.asarray(valid))
        return np.asarray(score_l1(v, self.vectors))[: self.n]


@functools.partial(jax.jit, static_argnames=("k",))
def _bow_add_jit(centroids, child_valid, weights, vectors, desc, tf, i, k: int):
    v = _bow_vector_jit(centroids, child_valid, weights, desc, tf, k)
    return vectors.at[i].set(v)


@functools.partial(jax.jit, static_argnames=("k",))
def _bow_add_many_jit(centroids, child_valid, weights, vectors, descs, tfs,
                      i0, k: int):
    """Vectors for B keyframe pools in ONE dispatch (vmapped descent +
    one dynamic_update_slice) — the chunk-batched DB add companion."""
    vs = jax.vmap(
        lambda d, t: _bow_vector_jit(centroids, child_valid, weights,
                                     d, t, k))(descs, tfs)
    return jax.lax.dynamic_update_slice(vectors, vs,
                                        (i0, jnp.zeros((), jnp.int32)))
