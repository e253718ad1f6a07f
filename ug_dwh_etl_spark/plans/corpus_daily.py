"""Daily training-corpus ingest plan — the round-6 pieces composed into
the one orchestrated call a 100 TB/day pipeline actually runs.

Per day, for an incoming document batch:

1. **Quality gate** (C4/Gopher rules, `operators.textstats`) — cheap
   map-side rejection before anything touches state.
2. **Exact dedup** (`operators.dedup.dedup_incremental`) — in-batch
   min-id survivor + fingerprint anti-join against the corpus
   fingerprint index (never the corpus text).
3. **Near-dup vs the stored LSH index**
   (`operators.dedup.incremental_neardup`) — band-key equi-join +
   candidate-restricted Jaccard; a batch doc near-duplicating an
   already-retained doc (or a lower-id batch survivor) is dropped.
4. **Append** the surviving docs to the corpus table AND their
   fingerprints / band keys / shingle hashes to the three index
   relations, so tomorrow's batch matches against today's without
   rescanning anything (the reference's daily ``if_exists="append"``
   cadence, `sf_html_data.py:178`, applied to corpus curation).

Costs per day: O(batch) tokenize/signature work + index equi-joins.
The corpus text is read by NOTHING here; all corpus-side lookups go
through the persisted metadata relations. State on disk after N days =
corpus docs + 3 index tables, all append-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from ug_dwh_etl_spark.operators.dedup import (
    doc_shingle_hashes,
    incremental_neardup,
    lsh_band_keys,
    normalized_fingerprint,
    spread,
)
from ug_dwh_etl_spark.operators.textstats import quality_filter


def _paths(root: str) -> dict[str, str]:
    return {
        "docs": os.path.join(root, "docs"),
        "fingerprints": os.path.join(root, "fingerprints"),
        "bands": os.path.join(root, "bands"),
        "shingles": os.path.join(root, "shingles"),
    }


def init_corpus_store(
    spark: SparkSession, root: str, seed: DataFrame, id_col: str, text_col: str
) -> None:
    """Bootstrap the corpus store from an initial (already-curated)
    document set: docs + the three index relations, written once."""
    p = _paths(root)
    seed.write.mode("overwrite").parquet(p["docs"])
    normalized_fingerprint(spread(seed), id_col, text_col).select(
        id_col, "fingerprint"
    ).write.mode("overwrite").parquet(p["fingerprints"])
    lsh_band_keys(seed, id_col, text_col).write.mode("overwrite").parquet(p["bands"])
    doc_shingle_hashes(spread(seed), id_col, text_col).write.mode(
        "overwrite"
    ).parquet(p["shingles"])


def corpus_daily_ingest(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> dict:
    """Run one day's batch through gate → exact dedup → near-dup-vs-
    index → append. Returns the funnel stats dict (metadata-sized).

    Near-dup drop rule: for every verified pair touching the batch,
    the HIGHER id is dropped (min-id survivor, consistent with the
    exact-dedup rule); a batch doc pairing with any already-stored
    corpus doc is always dropped (the corpus side is immutable)."""
    p = _paths(root)
    n_in = batch.count()

    # 1. quality gate (map-side). Each stage is localCheckpoint'ed:
    # this function takes ~8 actions (4 counts + 4 writes) and without
    # the cuts every one would re-run the whole gate→dedup→verify
    # lineage from the source — the same once-per-stage discipline as
    # minhash_lsh_pairs / bpe_train_rounds.
    flags = quality_filter(batch, id_col, text_col)
    kept_ids = flags.filter("keep").select(id_col)
    gated = batch.join(kept_ids, id_col, "left_semi").localCheckpoint()
    n_gated = gated.count()

    # 2. exact dedup: in-batch min-id survivor + anti-join vs the stored
    # fingerprint index (NOT the corpus text)
    fp_index = spark.read.parquet(p["fingerprints"]).select("fingerprint")
    b_fp = normalized_fingerprint(spread(gated), id_col, text_col)
    survivors = (
        b_fp.groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col))
        .join(fp_index, "fingerprint", "left_anti")
        .select(id_col)
    )
    exact_kept = gated.join(survivors, id_col, "left_semi").localCheckpoint()
    n_exact = exact_kept.count()

    # 3. near-dup vs the stored LSH index + within-batch
    pairs = incremental_neardup(
        exact_kept,
        spark.read.parquet(p["bands"]),
        spark.read.parquet(p["shingles"]),
        id_col,
        text_col,
        jaccard_threshold,
    )
    bset = exact_kept.select(F.col(id_col).alias("_bid"))
    # Membership flags per pair side: a batch doc pairing with a CORPUS
    # doc always drops (the store is immutable), whichever side of the
    # (min,max) normalization it landed on; for batch-batch pairs only
    # the max side drops (min-id survivor, same rule as exact dedup).
    a_in = bset.select(F.col("_bid").alias("id_a"), F.lit(True).alias("_a_b"))
    b_in = bset.select(F.col("_bid").alias("id_b"), F.lit(True).alias("_b_b"))
    pj = pairs.join(a_in, "id_a", "left").join(b_in, "id_b", "left")
    drop_a = pj.filter(F.col("_a_b").isNotNull() & F.col("_b_b").isNull()).select(
        F.col("id_a").alias(id_col)
    )
    drop_b = pj.filter(F.col("_b_b").isNotNull()).select(F.col("id_b").alias(id_col))
    drop = drop_a.unionByName(drop_b).distinct()
    final = exact_kept.join(drop, id_col, "left_anti").localCheckpoint()
    n_final = final.count()

    # 4. append survivors + their index rows (tomorrow matches against
    # them with zero corpus rescans)
    final.write.mode("append").parquet(p["docs"])
    normalized_fingerprint(spread(final), id_col, text_col).select(
        id_col, "fingerprint"
    ).write.mode("append").parquet(p["fingerprints"])
    lsh_band_keys(final, id_col, text_col).write.mode("append").parquet(p["bands"])
    doc_shingle_hashes(spread(final), id_col, text_col).write.mode("append").parquet(
        p["shingles"]
    )
    return {
        "n_in": n_in,
        "n_after_gate": n_gated,
        "n_after_exact": n_exact,
        "n_appended": n_final,
        "n_dropped_quality": n_in - n_gated,
        "n_dropped_exact": n_gated - n_exact,
        "n_dropped_neardup": n_exact - n_final,
    }
