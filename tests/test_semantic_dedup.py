"""SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
cluster-then-pairwise near-duplicate removal over embeddings."""

import numpy as np
import pytest

import eland_spark as es
from eland_spark.operators.similarity import semantic_dedup


@pytest.fixture(scope="module")
def emb_frame(spark):
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    # 4 well-separated base vectors, each with 2 exact-ish copies and
    # 3 distant noise vectors
    for b in range(4):
        base = rng.normal(0, 1, 16)
        base /= np.linalg.norm(base)
        for j in range(3):  # near-identical copies (cos ~ 1)
            v = base + rng.normal(0, 0.001, 16)
            rows.append((vid, f"g{b}", [float(x) for x in v]))
            vid += 1
        for j in range(3):  # unrelated vectors
            v = rng.normal(0, 1, 16)
            rows.append((vid, f"g{b}", [float(x) for x in v]))
            vid += 1
    sdf = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    return es.DataFrame(sdf, index_cols=("vec_id",))


def test_semantic_dedup_drops_within_cluster_copies(emb_frame):
    kept = semantic_dedup(
        emb_frame, threshold=0.98, n_cells=4, max_iter=2, seed_strategy="first"
    )
    ids = sorted(r["vec_id"] for r in kept.to_spark().collect())
    # each copy-triple collapses to its lowest id; noise survives.
    # copies are ids {0,1,2},{6,7,8},{12,13,14},{18,19,20}
    for trip in ([0, 1, 2], [6, 7, 8], [12, 13, 14], [18, 19, 20]):
        surviving = [i for i in trip if i in ids]
        assert surviving == [trip[0]], (trip, surviving)
    # all 24 - 4*2 = 16 rows remain
    assert len(ids) == 16


def test_semantic_dedup_threshold_1_keeps_everything(emb_frame):
    kept = semantic_dedup(
        emb_frame, threshold=1.0000001, n_cells=4, max_iter=1,
        seed_strategy="first",
    )
    assert kept.to_spark().count() == 24
