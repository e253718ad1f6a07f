"""Invariant tests for the training-data operators added on top of the
oracle checks (which prove value equality but not the semantic bounds)."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_chunks_cover_docs_within_bounds(spark):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    rows = QUERIES["text_chunk_docs"].fn(spark, SF).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.n_tokens <= 32
        assert len(r.chunk_text.split(" ")) == r.n_tokens
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        starts = sorted(c.start for c in chunks)
        # stride-24 grid from 1, no gaps
        assert starts == list(range(1, starts[-1] + 1, 24))


def test_pack_sequences_fill_contiguously(spark):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    rows = QUERIES["text_pack_sequences"].fn(spark, SF).collect()
    assert rows
    shards: dict[int, list] = {}
    for r in rows:
        shards.setdefault(r.shard, []).append(r)
    for shard_rows in shards.values():
        shard_rows.sort(key=lambda r: (r.doc_id, r.start))
        cum = 0
        for r in shard_rows:
            # pack assignment is the prefix-sum bucket, deterministic
            assert r.pack_id == cum // 1024
            cum += r.n_tokens


def test_knn_join_contract(spark):
    from ug_dwh_etl_spark.operators.similarity import knn_join
    from ug_dwh_etl_spark.queries.registry import table

    emb = table(spark, SF, "embeddings")
    out = knn_join(emb, query_mod=97, k=3).collect()
    assert out
    per_q: dict[int, list] = {}
    for r in out:
        assert r.neighbor_id != r.q_id
        assert -1.000001 <= r.cosine <= 1.000001
        per_q.setdefault(r.q_id, []).append(r.cosine)
    n = emb.count()
    for q_id, cosines in per_q.items():
        assert q_id % 97 == 0
        assert len(cosines) == min(3, n - 1)
        assert cosines == sorted(cosines, reverse=True)
    # every query vector produced a group
    assert len(per_q) == emb.filter(F.col("vec_id") % 97 == 0).count()
