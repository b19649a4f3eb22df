"""ANN operators: brute-force vs LSH vs IVF — recall sanity + determinism."""

import pytest

from conftest import SF_MED

from gitlab_elasticsearch_indexer_spark.operators.ann import (
    brute_force_topk,
    ivf_topk,
    lsh_bucket_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_MED}/embeddings.parquet").cache()


def test_ivf_recall_vs_brute(spark, emb):
    exact = [r["vec_id"] for r in brute_force_topk(emb, 0, 10).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, 0, 10, n_clusters=8, n_probe=4).collect()]
    # probe half the cells -> expect decent overlap; exact values are
    # data-dependent, so assert recall floor not identity
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (exact, approx)


def test_ivf_deterministic(spark, emb):
    a = [tuple(r) for r in ivf_topk(emb, 3, 5).collect()]
    b = [tuple(r) for r in ivf_topk(emb, 3, 5).collect()]
    assert a == b


def test_ivf_full_probe_equals_brute(spark, emb):
    """Probing every cell must reproduce the exact result (safe degradation)."""
    exact = [r["vec_id"] for r in brute_force_topk(emb, 7, 10).collect()]
    full = [r["vec_id"] for r in ivf_topk(emb, 7, 10, n_clusters=8, n_probe=8).collect()]
    assert full == exact


class TestIvfStoredTable:
    """ivf_write/ivf_search: the cell-partitioned layout must (a) reproduce
    ivf_topk's results and (b) actually PRUNE — the physical plan's scan
    carries a PartitionFilters entry on cell, so only n_probe/n_clusters of
    the stored table is read."""

    @pytest.fixture(scope="class")
    def ivf_dir(self, spark, tmp_path_factory):
        from gitlab_elasticsearch_indexer_spark.operators.ann import ivf_write

        emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
        d = str(tmp_path_factory.mktemp("ivf"))
        ivf_write(emb, d, n_clusters=8)
        return d

    def test_matches_inline_ivf(self, spark, emb, ivf_dir):
        from gitlab_elasticsearch_indexer_spark.operators.ann import ivf_search

        qvec = emb.filter("vec_id = 0").head()["embedding"]
        stored = ivf_search(
            spark, ivf_dir, list(qvec), 10, n_probe=4, exclude_vec_id=0
        ).collect()
        inline = ivf_topk(emb, 0, 10, n_clusters=8, n_probe=4).collect()
        assert [tuple(r) for r in stored] == [tuple(r) for r in inline]

    def test_full_probe_equals_brute(self, spark, emb, ivf_dir):
        from gitlab_elasticsearch_indexer_spark.operators.ann import ivf_search

        qvec = emb.filter("vec_id = 7").head()["embedding"]
        stored = [
            r["vec_id"]
            for r in ivf_search(
                spark, ivf_dir, list(qvec), 10, n_probe=8, exclude_vec_id=7
            ).collect()
        ]
        exact = [r["vec_id"] for r in brute_force_topk(emb, 7, 10).collect()]
        assert stored == exact

    def test_partition_pruning_in_plan(self, spark, emb, ivf_dir):
        import os
        import re

        from gitlab_elasticsearch_indexer_spark.operators.ann import ivf_search

        qvec = emb.filter("vec_id = 0").head()["embedding"]
        plan = ivf_search(spark, ivf_dir, list(qvec), 10, n_probe=2)._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "cell" in m.group(1), plan
        # layout check: one directory per cell, vectors nowhere else
        cells = [p for p in os.listdir(ivf_dir + "/vectors") if p.startswith("cell=")]
        assert len(cells) == 8


def test_lsh_subset_of_corpus(spark, emb):
    hits = lsh_bucket_topk(emb, 0, 5).collect()
    assert len(hits) <= 5
    assert all(r["vec_id"] != 0 for r in hits)


def test_rp_bucket_matches_brute_within_bucket(spark, emb):
    """Random-projection sign-LSH: results are the exact cosine ranking of
    the query's bucket (a subset of the brute ranking)."""
    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.operators.ann import (
        random_planes,
        rp_bucket,
        rp_bucket_topk,
    )

    planes = random_planes(64, 8, seed=7)
    got = rp_bucket_topk(emb, 0, 5, dim=64).toPandas()
    bucketed = emb.withColumn("bucket", rp_bucket(F.col("embedding"), planes))
    qb = bucketed.filter(F.col("vec_id") == 0).collect()[0]["bucket"]
    members = {
        r["vec_id"]
        for r in bucketed.filter(F.col("bucket") == qb).collect()
    } - {0}
    assert set(got["vec_id"]) <= members
    assert len(got) == min(5, len(members))
    # deterministic across runs (seeded planes)
    again = rp_bucket_topk(emb, 0, 5, dim=64).toPandas()
    assert got["vec_id"].tolist() == again["vec_id"].tolist()


class TestLshBandingRecall:
    """b x r minhash banding over a synthetic near-dup corpus: high-Jaccard
    pairs must surface as candidates (the S-curve recall property), and the
    bucket cap must drop mega-cluster buckets."""

    @pytest.fixture(scope="class")
    def near_dup_docs(self, spark):
        import random

        import pandas as pd

        rng = random.Random(11)
        pool = [f"w{i}" for i in range(300)]
        rows = []
        for i in range(25):
            words = rng.sample(pool, 40)
            rows.append((2 * i, " ".join(words)))
            # near-dup: drop two words -> Jaccard ~ 38/40 = 0.95
            rows.append((2 * i + 1, " ".join(words[:-2])))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )

    def test_banding_recall(self, spark, near_dup_docs):
        from gitlab_elasticsearch_indexer_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        pairs = {
            (r["a_docid"], r["b_docid"])
            for r in lsh_candidate_pairs(
                near_dup_docs, n_bands=16, rows_per_band=4
            ).collect()
        }
        true_pairs = {(2 * i, 2 * i + 1) for i in range(25)}
        recall = len(pairs & true_pairs) / len(true_pairs)
        assert recall >= 0.9, (recall, sorted(true_pairs - pairs))
        # unrelated docs (disjoint-ish samples) should rarely collide:
        # candidates stay far below all-pairs
        assert len(pairs) < 300, len(pairs)

    def test_bucket_cap_drops_mega_cluster(self, spark):
        import pandas as pd

        from gitlab_elasticsearch_indexer_spark.operators.dedup import (
            lsh_candidate_pairs,
        )

        same = " ".join(f"w{i}" for i in range(30))
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(20), "text": [same] * 20})
        )
        capped = lsh_candidate_pairs(
            docs, n_bands=4, rows_per_band=2, max_bucket=5
        ).count()
        uncapped = lsh_candidate_pairs(docs, n_bands=4, rows_per_band=2).count()
        assert uncapped == 20 * 19 // 2
        assert capped == 0
