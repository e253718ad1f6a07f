"""Deduplication operators for large-scale text corpora.

Four strategies, all shuffle-based and driver-free (no collect), sized
for 100 TB corpora:

- exact:        hash-groupBy on a normalized-content fingerprint. One
                shuffle on the 60-bit hash; survivors = min(doc_id).
- minhash_lsh:  shingle → 16 minhash permutations → 4 bands × 4 rows →
                bucket-join. The classic near-dup pipeline (Broder '97,
                as used in public LLM-data pipelines). Candidate
                generation never compares all pairs: only docs sharing a
                band bucket join.
- simhash:      32-bit sign-of-weighted-bits fingerprint (Charikar '02);
                near-dups have small Hamming distance.
- ngram_jaccard: exact Jaccard over word-3-gram shingle sets via a
                shingle-join — the verifier stage downstream of LSH.

Hashes are the cross-engine md5 primitives from ``hashing`` so every
operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ug_dwh_etl_spark.operators import hashing as H

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 32


def normalized_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — md5 of the token-normalized text."""
    norm = F.concat_ws(" ", H.tokens(text_col))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup groups: one row per distinct normalized content with
    the surviving (minimum) id and the group size. Deterministic — unlike
    ``dropDuplicates`` whose survivor is partition-order dependent."""
    fp = normalized_fingerprint(df, id_col, text_col)
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct — the exploded shingle-set relation."""
    sh = H.shingles(H.tokens(text_col), n)
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, mh0..mh15) — min over shingles of each permuted hash.

    One explode + one groupBy shuffle keyed on the doc id; the 16
    permutations are computed per shingle row inside codegen, so the
    shuffle payload is 16 longs per doc.
    """
    exploded = doc_shingles(df, id_col, text_col)
    h = H.md5_long("shingle", 15)
    perms = [H.minhash_perm(h, i).alias(f"p{i}") for i in range(N_MINHASH)]
    return (
        exploded.select(id_col, *perms)
        .groupBy(id_col)
        .agg(*[F.min(f"p{i}").alias(f"mh{i}") for i in range(N_MINHASH)])
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that agree on at
    least one LSH band. At scale the bucket-join is the whole point:
    shuffle keys are (band_id, band_key) so only same-bucket docs meet.
    """
    sig = minhash_signatures(df, id_col, text_col)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws(
                        "_",
                        *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                    ).alias("band_key"),
                )
                for b in range(N_BANDS)
            ])
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_key")
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 32-bit SimHash over distinct normalized tokens.

    Explode distinct tokens, hash each to 32 bits, then for each bit
    position sum +1/-1 and keep the sign. One shuffle on the doc id; the
    32 per-bit sums ride the same aggregation.
    """
    toks = (
        df.select(F.col(id_col), F.explode(H.tokens(text_col)).alias("tok"))
        .distinct()
        .withColumn("h", H.md5_long("tok", 8))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    summed = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return summed.select(F.col(id_col), fingerprint.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via shingle-join.

    |A∩B| comes from joining the exploded shingle relation with itself on
    the shingle (co-occurrence count), |A∪B| = |A|+|B|-|A∩B|. The join
    key is the shingle, so cost is Σ bucket² over shingle frequencies —
    at 100 TB this runs AFTER LSH banding prunes candidates; here it is
    also exposed standalone as the exact baseline.
    """
    sh = doc_shingles(df, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    jacc = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.round(jacc, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
