#!/usr/bin/env python
"""Measure the ER block-purging recall trade under DEGENERATE key growth.

SCALE.md §er claims purged blocks lose recall only for pairs that do
not also collide on the still-selective (brand, size) pass. This probe
measures it: expand `part` 4x WITHOUT shifting blocking keys (the
degenerate 'same' mode — blocks fatten x4), compute the UNCAPPED
verified pair set (ground truth: every multi-pass candidate at
levenshtein <= threshold) and the CAPPED set, and report

    recall           = |capped| / |uncapped|
    recovered_share  = of the pairs the degenerate (brand, type) pass
                       would generate, the fraction that also collide
                       on a surviving (brand, size) block

Usage:  python tools/er_recall_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("SCALE_PROBE_EXPAND_PART", "same")
sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402

FACTOR = int(os.environ.get("ER_RECALL_FACTOR", "4"))


def main() -> None:
    from tools import scale_probe
    from ug_dwh_etl_spark.queries.entity import (
        _BLOCK_CAP,
        candidate_pairs_capped_from,
    )
    from ug_dwh_etl_spark.queries import entity
    from ug_dwh_etl_spark.queries.registry import table
    from ug_dwh_etl_spark.session import get_spark

    spark = get_spark("er-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = scale_probe.build(spark, FACTOR)
    part = table(spark, sf_dir, "part")

    # uncapped ground truth = the same multi-pass generator with an
    # unreachable cap (cap binds nothing -> every verified pair)
    uncapped = candidate_pairs_capped_from(part, cap=1 << 60).select(
        "id_a", "id_b"
    )
    capped = candidate_pairs_capped_from(part, cap=_BLOCK_CAP).select(
        "id_a", "id_b"
    )
    n_un = uncapped.count()
    n_cap = capped.count()
    lost = uncapped.join(capped, ["id_a", "id_b"], "left_anti")
    n_lost = lost.count()

    # of the LOST pairs, how many collide on a (brand, size) block that
    # survived the cap? (zero = the recovery-path claim holds: losses
    # are exactly the pairs only the degenerate pass could see)
    k1, k2 = "p_brand", "p_size"
    ok_blocks = (
        part.groupBy(F.col(k1).alias("_k1"), F.col(k2).alias("_k2"))
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= _BLOCK_CAP)
        .select("_k1", "_k2")
    )
    a = part.select(
        F.col("p_partkey").alias("id_a"),
        F.col(k1).alias("_k1"),
        F.col(k2).alias("_k2"),
    ).join(F.broadcast(ok_blocks), ["_k1", "_k2"])
    b = part.select(
        F.col("p_partkey").alias("id_b"),
        F.col(k1).alias("_k1"),
        F.col(k2).alias("_k2"),
    )
    surviving_bs_pairs = a.join(b, ["_k1", "_k2"]).filter(
        F.col("id_a") < F.col("id_b")
    ).select("id_a", "id_b")
    n_lost_recoverable = lost.join(
        surviving_bs_pairs, ["id_a", "id_b"], "left_semi"
    ).count()

    print(
        json.dumps(
            {
                "factor": FACTOR,
                "cap": _BLOCK_CAP,
                "uncapped_pairs": n_un,
                "capped_pairs": n_cap,
                "recall": round(n_cap / n_un, 4) if n_un else None,
                "lost_pairs": n_lost,
                "lost_but_bs_block_survives": n_lost_recoverable,
                "lev_max": entity._LEV_MAX,
            }
        )
    )


if __name__ == "__main__":
    main()
