"""Feature-engineering wave: LOO target encoding, WOE binning, k-fold
complement statistics — verified against direct computation on tiny
frames (the sf0.01 oracle gate proves the registered queries)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def test_loo_encoding_excludes_own_label(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 0), (3, "a", 1), (4, "b", 1), (5, "b", 0)],
        "id long, segment string, y long",
    )
    seg = df.groupBy("segment").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    got = {
        r.id: r.enc
        for r in df.join(seg, "segment")
        .select(
            "id",
            ((F.col("s") - F.col("y")) / (F.col("n") - 1).cast("double")).alias(
                "enc"
            ),
        )
        .collect()
    }
    # segment a: sum=2 n=3 -> row1 (2-1)/2=0.5, row2 (2-0)/2=1.0
    assert got[1] == 0.5 and got[2] == 1.0 and got[3] == 0.5
    assert got[4] == 0.0 and got[5] == 1.0


def test_kfold_complement_equals_direct_train(spark):
    """Slope trained from (total - fold) sufficient statistics must
    equal OLS fit directly on the other folds' rows."""
    import random

    rng = random.Random(7)
    # values pre-quantized to 3 decimals so the decimal(_,3) casts are
    # lossless and the Python reference sees identical inputs
    rows = [
        (i, i % 3, float(x), round(3.0 * x + 5 + rng.uniform(-1, 1), 3))
        for i, x in enumerate(rng.sample(range(100), 60))
    ]
    df = spark.createDataFrame(rows, "id long, fold int, x double, y double")
    li = df.select(
        "fold",
        F.col("x").cast("decimal(9,3)").alias("x"),
        F.col("y").cast("decimal(13,3)").alias("y"),
    )
    fs = li.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = fs.agg(
        F.sum("n").alias("tn"), F.sum("sx").alias("tsx"), F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"), F.sum("sxy").alias("tsxy"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    params = (
        fs.crossJoin(tot)
        .select(
            "fold",
            (
                (d(F.col("tsxy") - F.col("sxy"))
                 - d(F.col("tsx") - F.col("sx")) * d(F.col("tsy") - F.col("sy"))
                 / d(F.col("tn") - F.col("n")))
                / (d(F.col("tsxx") - F.col("sxx"))
                   - d(F.col("tsx") - F.col("sx")) * d(F.col("tsx") - F.col("sx"))
                   / d(F.col("tn") - F.col("n")))
            ).alias("b1"),
        )
        .collect()
    )
    got = {r.fold: r.b1 for r in params}
    for fold in range(3):
        others = [(x, y) for (_, f, x, y) in rows if f != fold]
        n = len(others)
        sx = sum(x for x, _ in others)
        sy = sum(y for _, y in others)
        sxx = sum(x * x for x, _ in others)
        sxy = sum(x * y for x, y in others)
        direct = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        assert math.isclose(got[fold], direct, rel_tol=1e-9), (fold, got[fold], direct)


def test_woe_zero_cell_guard(spark):
    """A bin with zero positives must produce NULL woe, not an error."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, float(i), 1 if i >= 6 else 0) for i in range(1, 9)],
        "id long, v double, y long",
    )
    r = df.select(
        "y", F.ntile(2).over(Window.orderBy("v", "id")).alias("bin")
    )
    b = r.groupBy("bin").agg(
        F.sum("y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).alias("n_neg"),
    )
    t = b.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    pos_r = F.col("n_pos") / F.col("tp").cast("double")
    neg_r = F.col("n_neg") / F.col("tn").cast("double")
    got = {
        r.bin: r.woe
        for r in b.crossJoin(t)
        .select("bin", F.when(ok, F.log(pos_r / neg_r)).alias("woe"))
        .collect()
    }
    assert got[1] is None  # bin 1 = values 1..4, all negative
    assert got[2] is not None


def test_left_outer_ivm_flip_rule(spark):
    """Padded row flips when its key arrives in dB; padded row whose
    key never arrives stays padded; matched row gains extra matches."""
    from ug_dwh_etl_spark.operators.ivm import refresh_left_outer_view

    a_old = spark.createDataFrame(
        [(1, "x1"), (2, "x2"), (3, "x3")], "k long, av string"
    )
    a_delta = spark.createDataFrame([(4, "x4"), (9, "x9")], "k long, av string")
    b_old = spark.createDataFrame([(1, "b1")], "bk long, bv string")
    b_delta = spark.createDataFrame(
        [(2, "b2"), (1, "b1x"), (4, "b4")], "bk long, bv string"
    )
    got = {
        (r.k, r.av, r.bv)
        for r in refresh_left_outer_view(
            a_old, a_delta, b_old, b_delta, "k", "bk"
        ).collect()
    }
    assert got == {
        (1, "x1", "b1"),    # kept old match
        (1, "x1", "b1x"),   # extra match from dB
        (2, "x2", "b2"),    # flipped: padded row retracted, match added
        (3, "x3", None),    # still padded — key 3 never arrived
        (4, "x4", "b4"),    # new left row, matched in dB
        (9, "x9", None),    # new left row, padded
    }
