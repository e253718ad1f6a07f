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


def test_quality_filter_rules_fire_individually(spark):
    from ug_dwh_etl_spark.operators.textstats import quality_filter

    rows = [
        (1, "the quick brown fox " * 10),          # prose-ish: keep
        (2, "short text the end"),                 # too few words
        (3, ("zz " * 50).strip()),                 # no stopwords
        (4, "supercalifragilisticexpialidocious " * 40),  # words too long
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in quality_filter(df, "id", "text", min_words=10).collect()}
    assert got[1].keep
    assert not got[2].words_ok and not got[2].keep
    assert not got[3].stopword_ok and not got[3].keep
    assert not got[4].word_len_ok and not got[4].keep


def test_contamination_scan_counts_and_misses(spark):
    from ug_dwh_etl_spark.operators.textstats import contamination_scan

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta"), (3, "unrelated")],
        "id long, text string",
    )
    got = {r.probe: (r.n_docs, r.pct_docs) for r in contamination_scan(
        df, "id", "text", ("beta gamma", "nope")).collect()}
    assert got["beta gamma"] == (2, round(2 / 3, 6))
    assert got["nope"] == (0, 0.0)


def test_dedup_incremental_batch_and_corpus_rules(spark):
    from ug_dwh_etl_spark.operators.dedup import dedup_incremental

    existing = spark.createDataFrame(
        [(1, "already in the corpus"), (2, "another old doc")], "id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "Already in the corpus!"),   # normalizes to an existing doc
            (11, "a brand new document"),
            (12, "a brand new document"),     # in-batch dup of 11
            (13, "second new document"),
        ],
        "id long, text string",
    )
    kept = {r.id for r in dedup_incremental(batch, existing, "id", "text").collect()}
    assert kept == {11, 13}


def test_verify_pairs_restricted_to_candidates(spark):
    from ug_dwh_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        verify_pairs_jaccard,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tomorrow")),
        (3, "completely unrelated text about database engines and query planning"),
        (4, "completely unrelated text about database engines and query planners"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = minhash_lsh_pairs(df, "id", "text")
    verified = {
        (r.id_a, r.id_b): r.jaccard
        for r in verify_pairs_jaccard(df, pairs, "id", "text", 0.3).collect()
    }
    # verification on candidates agrees with the standalone exact Jaccard
    # wherever LSH proposed the pair
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "id", "text", 0.3).collect()
    }
    cand = {tuple(r) for r in pairs.collect()}
    assert verified == {p: j for p, j in exact.items() if p in cand}
    assert (1, 2) in verified


def test_duplicate_spans_flags_repeated_ngrams(spark):
    from ug_dwh_etl_spark.queries.dedup import text_duplicate_spans, _SPAN_N

    assert _SPAN_N == 8
    import shutil, tempfile, os
    tmp = tempfile.mkdtemp(prefix="dupspan_")
    try:
        boiler = "one two three four five six seven eight"  # exactly 8 tokens
        rows = [
            (1, boiler + " unique tail alpha beta"),
            (2, boiler + " different ending gamma delta"),  # shares the boiler span
            (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            f"{tmp}/documents.parquet"
        )
        got = {r.doc_id: r for r in text_duplicate_spans(spark, tmp).collect()}
        # docs 1 and 2 share the 8-token boiler span -> it counts as dup in both
        assert got[1].n_dup_spans >= 1 and got[2].n_dup_spans >= 1
        assert got[3].n_dup_spans == 0 and got[3].dup_span_ratio == 0.0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bm25_ranking_invariants(spark):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    rows = QUERIES["text_bm25_topdocs"].fn(spark, SF).collect()
    assert rows, "probe terms must hit at least one doc"
    # ranks are 1..n contiguous and ordered by (score desc, doc_id)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a.bm25, -a.doc_id) >= (b.bm25, -b.doc_id) or a.bm25 > b.bm25
        assert a.bm25 >= b.bm25
    # BM25 of a finite probe set is bounded by sum of idf*(k1+1)
    assert all(r.bm25 >= 0 for r in rows)
