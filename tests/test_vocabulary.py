"""Binary BoW vocabulary: build, lookup, scoring, closure shortlist.

Covers mapping.vocabulary (the DBoW2 / create_vocabulary_dbow2 analog,
create_vocabulary_dbow2.cpp; query site CTrackerGT.cpp:411) and its
integration as the optional shortlist path of mapping.closure.find_closures.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from svi_mapper_tpu.geometry import se3
from svi_mapper_tpu.mapping import closure
from svi_mapper_tpu.mapping import vocabulary as voc


def _clustered_descs(rng, n_clusters, per_cluster, flip_bits=8):
    """Descriptors in tight Hamming clusters: center + a few flipped bits."""
    centers = rng.integers(0, 2 ** 32, (n_clusters, 8), dtype=np.uint64).astype(np.uint32)
    out, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            for _ in range(flip_bits):
                b = int(rng.integers(0, 256))
                d[b // 32] ^= np.uint32(1 << (b % 32))
            out.append(d)
            labels.append(c)
    return np.stack(out), np.asarray(labels), centers


def _pool(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint64).astype(np.uint32)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(3)
    desc, labels, centers = _clustered_descs(rng, 16, 40)
    vocab = voc.build_vocabulary(desc, k=4, levels=3, iters=6, seed=0,
                                 doc_ids=labels % 8)
    return vocab, desc, labels, centers, rng


def test_clusters_map_to_consistent_words(trained):
    vocab, desc, labels, centers, _ = trained
    words = np.asarray(voc.word_ids(vocab, jnp.asarray(desc)))
    assert words.min() >= 0 and words.max() < vocab.num_words
    # within a tight Hamming cluster the dominant word should cover most members
    purity = []
    for c in range(16):
        w = words[labels == c]
        purity.append(np.bincount(w).max() / len(w))
    assert np.mean(purity) > 0.7


def test_bow_vector_normalized_and_scores(trained):
    vocab, desc, labels, _, _ = trained
    v0 = voc.bow_vector(vocab, jnp.asarray(desc[labels == 0]))
    v0b = voc.bow_vector(vocab, jnp.asarray(desc[labels == 0][::-1]))
    v1 = voc.bow_vector(vocab, jnp.asarray(desc[labels == 1]))
    assert abs(float(jnp.sum(v0)) - 1.0) < 1e-5
    s_same = float(voc.score_l1(v0, v0b[None])[0])
    s_diff = float(voc.score_l1(v0, v1[None])[0])
    assert s_same > 0.99
    assert s_same > s_diff + 0.2


def test_bow_vector_valid_mask(trained):
    vocab, desc, labels, _, _ = trained
    d = jnp.asarray(desc[labels == 2][:20])
    full = voc.bow_vector(vocab, d)
    # masking half the pool to the *other* half's garbage must not change
    # the vector built from the valid half alone
    other = jnp.asarray(desc[labels == 3][:20])
    both = jnp.concatenate([d, other])
    mask = jnp.asarray([True] * 20 + [False] * 20)
    masked = voc.bow_vector(vocab, both, mask)
    assert float(jnp.max(jnp.abs(full - masked))) < 1e-6


def test_database_ranks_revisit_first(trained):
    vocab, desc, labels, _, rng = trained
    db = voc.BowDatabase(vocab, capacity=8)
    for c in range(4):
        db.add(desc[labels == c])
    # noisy re-observation of place 2
    q = desc[labels == 2].copy()
    q[:, 1] ^= 0b101
    scores = db.query(q)
    assert scores.shape == (4,)
    assert int(np.argmax(scores)) == 2


def test_save_load_roundtrip(tmp_path, trained):
    vocab, desc, _, _, _ = trained
    p = tmp_path / "vocab.npz"
    voc.save_vocabulary(p, vocab)
    loaded = voc.load_vocabulary(p)
    w0 = np.asarray(voc.word_ids(vocab, jnp.asarray(desc[:64])))
    w1 = np.asarray(voc.word_ids(loaded, jnp.asarray(desc[:64])))
    assert (w0 == w1).all()
    assert np.allclose(np.asarray(vocab.weights), np.asarray(loaded.weights))


def test_find_closures_with_bow_shortlist(rng):
    """find_closures through the BoW shortlist path finds the same revisit
    as the exact all-pairs path (test_backend.test_find_closures_end_to_end)."""
    train = _pool(rng, 4000)
    vocab = voc.build_vocabulary(train, k=4, levels=3, iters=4, seed=1)

    db = closure.KeyframeDatabase.create(capacity=32, pool_size=128,
                                         vocabulary=vocab)
    assert db.bow is not None
    pts = rng.normal(size=(100, 3)).astype(np.float32) * np.asarray([5, 5, 1]) \
        + np.asarray([0, 0, 10])
    pts = pts.astype(np.float32)
    desc_shared = _pool(rng, 100)

    T0 = np.eye(4, dtype=np.float32)
    db.add(desc_shared, pts, T0)
    for _ in range(11):
        db.add(_pool(rng, 100), pts + rng.normal(size=pts.shape).astype(np.float32), np.eye(4))
    T12 = np.asarray(se3.exp_se3(jnp.asarray([0.5, 0.1, 1.0, 0.02, 0.3, 0.01], jnp.float32)))
    p12 = np.asarray(se3.transform(jnp.asarray(T12), jnp.asarray(pts)))
    db.add(desc_shared, p12, T12)

    found = closure.find_closures(db, 12, exclude_recent=2)
    assert len(found) == 1
    assert found[0].ref_kf == 0
    T_expected = T12 @ np.linalg.inv(T0)
    assert np.abs(found[0].T_qr - T_expected).max() < 0.02

    # DBoW2 direct-index restriction (DBOW2_ID_LEVELS,
    # CTrackerGT.cpp:38-39,248-250): identical revisit descriptors share
    # their vocabulary nodes by construction, so the SAME closure must
    # survive with the node-equality mask on — and with no fewer than the
    # ICP minimum inliers.
    found_di = closure.find_closures(db, 12, exclude_recent=2,
                                     direct_index_levels=2)
    assert len(found_di) == 1
    assert found_di[0].ref_kf == 0
    assert np.abs(found_di[0].T_qr - T_expected).max() < 0.02
    # the restriction can only remove correspondences, never add them
    assert found_di[0].matches <= found[0].matches


def test_node_ids_are_word_id_prefixes(trained):
    """node_ids at level L is the depth-L ancestor of the full descent:
    word_id // k**(levels-L) (the defining property of DBoW2's direct
    index — features under one node share the word-id prefix)."""
    vocab, desc, _, _, _ = trained
    words = np.asarray(voc.word_ids(vocab, jnp.asarray(desc)))
    for L in (1, 2):
        nodes = np.asarray(voc.node_ids(vocab, jnp.asarray(desc), L))
        np.testing.assert_array_equal(
            nodes, words // vocab.k ** (vocab.levels - L))
    # clamped at the vocabulary depth
    nodes_full = np.asarray(voc.node_ids(vocab, jnp.asarray(desc), 99))
    np.testing.assert_array_equal(nodes_full, words)


def test_direct_index_mask_restricts_match_pools(trained, rng):
    """match_pools with node ids: the match set is a subset of the
    unrestricted one and every surviving pair shares its vocabulary node."""
    vocab, _, _, _, _ = trained
    P = 64
    desc_q = _pool(rng, P)
    # reference pool = query pool bit-flipped a little (within cutoff) so
    # unrestricted matching links slot i to slot i
    desc_r = desc_q.copy()
    for i in range(P):
        b = int(rng.integers(0, 256))
        desc_r[i, b // 32] ^= np.uint32(1 << (b % 32))
    p_q = rng.normal(size=(P, 3)).astype(np.float32)
    p_r = p_q + 0.01
    valid = np.ones(P, bool)
    nq = voc.node_ids(vocab, jnp.asarray(desc_q), 2)
    nr = voc.node_ids(vocab, jnp.asarray(desc_r), 2)

    _, _, ok0, fwd0 = closure.match_pools(
        jnp.asarray(desc_q), jnp.asarray(p_q), jnp.asarray(valid),
        jnp.asarray(desc_r), jnp.asarray(p_r), jnp.asarray(valid))
    _, _, ok1, fwd1 = closure.match_pools(
        jnp.asarray(desc_q), jnp.asarray(p_q), jnp.asarray(valid),
        jnp.asarray(desc_r), jnp.asarray(p_r), jnp.asarray(valid),
        node_q=nq, node_r=nr)
    ok0, ok1 = np.asarray(ok0), np.asarray(ok1)
    fwd1 = np.asarray(fwd1)
    nq, nr = np.asarray(nq), np.asarray(nr)
    assert ok1.sum() > 0                      # 1-bit flips keep most nodes
    assert not np.any(ok1 & ~ok0)             # subset of the unrestricted set
    assert np.all(nq[ok1] == nr[fwd1[ok1]])   # pairs share their node
