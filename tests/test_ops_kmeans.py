import numpy as np
import pytest
import sklearn.cluster
import sklearn.metrics

from videotofaces_tpu.ops import kmeans as KM
from videotofaces_tpu.ops import cluster_scores as CS


def _blobs(rng, n_per=40, k=4, d=16, spread=0.5):
    centers = rng.normal(0, 5, size=(k, d))
    pts = np.concatenate([c + rng.normal(0, spread, size=(n_per, d)) for c in centers])
    return pts.astype(np.float32)


def _relabel_to_match(labels, ref):
    """Map label ids so cluster numbering differences don't matter."""
    out = np.empty_like(labels)
    for lbl in np.unique(labels):
        mask = labels == lbl
        vals, counts = np.unique(ref[mask], return_counts=True)
        out[mask] = vals[np.argmax(counts)]
    return out


@pytest.mark.parametrize("k", [2, 4, 6])
def test_kmeans_matches_sklearn_assignments(rng, k):
    x = _blobs(rng, n_per=50, k=4)
    for seed in [0, 1]:
        labels, centers, inertia = KM.kmeans_fit(x, k, random_state=seed)
        sk = sklearn.cluster.KMeans(n_clusters=k, random_state=seed, n_init="auto").fit(x)
        got = _relabel_to_match(labels, sk.labels_)
        assert (got == sk.labels_).mean() == 1.0, f"k={k} seed={seed}"


def test_kmeans_plusplus_indices_match_sklearn(rng):
    x = _blobs(rng, n_per=30, k=5, d=8)
    from sklearn.cluster import kmeans_plusplus as sk_pp

    for seed in [0, 3]:
        _, got_idx = KM.kmeans_plusplus(x, 5, seed)
        _, want_idx = sk_pp(x, 5, random_state=seed)
        np.testing.assert_array_equal(got_idx, want_idx)


def test_scores_match_sklearn(rng):
    x = _blobs(rng, n_per=35, k=3, d=12)
    labels, _, _ = KM.kmeans_fit(x, 3, random_state=0)
    s_got = CS.silhouette_score(x, labels)
    s_want = sklearn.metrics.silhouette_score(x, labels)
    assert abs(s_got - s_want) < 1e-4

    ch_got = CS.calinski_harabasz_score(x, labels)
    ch_want = sklearn.metrics.calinski_harabasz_score(x, labels)
    assert abs(ch_got - ch_want) / ch_want < 1e-4

    db_got = CS.davies_bouldin_score(x, labels)
    db_want = sklearn.metrics.davies_bouldin_score(x, labels)
    assert abs(db_got - db_want) < 1e-4


def test_rand_score_matches_sklearn(rng):
    a = rng.integers(0, 4, size=100)
    b = rng.integers(0, 3, size=100)
    assert abs(CS.rand_score(a, b) - sklearn.metrics.rand_score(a, b)) < 1e-12
    assert CS.rand_score(a, a) == 1.0
