"""Round-10 additions: merge-on-read delete-file pruning, batch-id
lineage backfill for legacy manifests, and the reader guard hardening."""

import json
import os

import pyspark.sql.functions as F
import pytest


def _kv(spark, lo, hi, v=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(v).cast("long").alias("v")
    )


def test_delete_pruning_bypasses_untouched_files(spark, tmp_path):
    """An equality delete whose key range can't intersect an old data
    dir must NOT anti-join that dir: plan shows no LeftAnti at all when
    every old file is provably disjoint, and the rows are identical to
    the conservative read."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 100), stats_cols=("k",))
    # upsert keys 200..209 — disjoint from [0, 99]
    t.commit_merge_on_read(_kv(spark, 200, 210, v=7), key_cols=["k"], stats_cols=("k",))
    df = t.read_as_of(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan, "disjoint delete still anti-joined"
    got = {r.k: r.v for r in df.collect()}
    assert len(got) == 110 and got[0] == 1 and got[205] == 7

    # control: an OVERLAPPING delete must keep the anti-join and drop rows
    t2 = SnapshotTable(str(tmp_path / "t2"))
    t2.commit_overwrite(_kv(spark, 0, 100), stats_cols=("k",))
    t2.commit_merge_on_read(_kv(spark, 50, 60, v=7), key_cols=["k"], stats_cols=("k",))
    df2 = t2.read_as_of(spark)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan2
    got2 = {r.k: r.v for r in df2.collect()}
    assert got2[55] == 7 and got2[0] == 1 and len(got2) == 100


def test_delete_pruning_is_numeric_not_lexicographic(spark, tmp_path):
    """Regression: the legacy string-cast stats order numerics
    lexicographically ('10' < '9'), which would falsely prove a delete
    of key 10 disjoint from a dir holding [9, 11] and resurrect the
    deleted row. The typed-stats path must keep the anti-join."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 9, 12), stats_cols=("k",))  # keys 9,10,11
    t.commit_merge_on_read(_kv(spark, 10, 11, v=7), key_cols=["k"], stats_cols=("k",))
    got = {r.k: r.v for r in t.read_as_of(spark).collect()}
    assert got == {9: 1, 10: 7, 11: 1}


def test_delete_pruning_conservative_without_stats(spark, tmp_path):
    """Commits made without stats_cols leave no typed bounds — the
    reader must stay conservative (anti-join everything applicable) and
    still produce the exact merged relation."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 10))
    t.commit_merge_on_read(_kv(spark, 200, 203, v=7), key_cols=["k"])
    df = t.read_as_of(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan  # no stats -> cannot prove disjoint
    assert df.count() == 13


def test_scan_pruned_composes_with_delete_pruning(spark, tmp_path):
    """scan_pruned's per-file range pruning and the delete-file pruning
    stack: a range read over the untouched old files carries no
    anti-join, and rows survive exactly."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        _kv(spark, 0, 100).withColumn("pad", F.format_string("%04d", F.col("k"))),
        stats_cols=("pad", "k"),
    )
    t.commit_merge_on_read(
        _kv(spark, 500, 510, v=7).withColumn(
            "pad", F.format_string("%04d", F.col("k"))
        ),
        key_cols=["k"],
        stats_cols=("pad", "k"),
    )
    df, read, total = t.scan_pruned(spark, "pad", "0010", "0019")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan
    ks = sorted(r.k for r in df.filter(F.col("pad").between("0010", "0019")).collect())
    assert ks == list(range(10, 20))
    assert read < total


def test_mixed_delete_key_sets_raise(spark, tmp_path):
    """The mixed-key-set guard must survive `python -O` — a ValueError,
    not a bare assert (round-9 ADVICE)."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(
        _kv(spark, 0, 10).withColumn("k2", F.col("k") + 100)
    )
    t.commit_merge_on_read(
        _kv(spark, 0, 2, v=7).withColumn("k2", F.col("k") + 100),
        key_cols=["k"],
    )
    t.commit_merge_on_read(
        _kv(spark, 2, 4, v=8).withColumn("k2", F.col("k") + 100),
        key_cols=["k2"],
    )
    with pytest.raises(ValueError, match="mixed delete key sets"):
        t.read_as_of(spark).collect()


def test_legacy_manifest_batchid_backfill(spark, tmp_path):
    """A table whose manifests predate the 'batch_ids' lineage field
    must still dedup replays of PRE-migration batches after the first
    new-format commit (round-9 ADVICE: the old fallback scan ran only
    while the parent lacked the field, so a legacy batch could
    double-land one commit later)."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    s1 = t.commit_append(_kv(spark, 0, 5), batch_id=7)
    # strip the lineage field to simulate a legacy manifest
    mp = t._manifest_path(s1)
    m = json.load(open(mp))
    del m["batch_ids"]
    json.dump(m, open(mp, "w"))
    # first NEW-format commit on the legacy table: must backfill batch 7
    s2 = t.commit_append(_kv(spark, 5, 10), batch_id=8)
    assert str(7) in t.manifest(s2)["batch_ids"]
    # replaying the pre-migration batch must be a no-op returning s1
    assert t.commit_append(_kv(spark, 0, 5), batch_id=7) == s1
    assert t.latest_snapshot_id() == s2
    assert t.read_as_of(spark).count() == 10


def _final_plan(df) -> str:
    """The EXECUTED plan for this exact DataFrame (collect first so the
    AdaptiveSparkPlan is final); under AQE, trim off the '== Initial
    Plan ==' tail so assertions see only what actually ran."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_ranking_reuses_one_range_exchange_under_aqe_on_and_off(spark):
    """Pin the invariant global_row_number's correctness rests on: the
    local-rank branch and the offsets branch must read the SAME physical
    range exchange (round-9 ADVICE — a planner change that re-executed
    the range shuffle per branch with different partition assignment
    would silently corrupt ranks). Assert exactly one materialized
    range exchange + a ReusedExchange over it, AQE on AND off, and that
    the ranks themselves are identical either way."""
    from ug_dwh_etl_spark.operators.ranking import global_row_number

    df = spark.range(100_000).select(
        (F.col("id") % 97).alias("v"), F.col("id")
    )
    results = {}
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            out = global_row_number(df, ["v", "id"], out="i")
            plan = _final_plan(out)
            n_range = plan.count("+- Exchange rangepartitioning")
            n_reused = plan.count("ReusedExchange")
            assert n_range == 1, f"AQE={aqe}: {n_range} materialized range exchanges"
            assert n_reused >= 1, f"AQE={aqe}: offsets branch does not reuse"
            # the reuse must be OF the range exchange, not some other node
            reused_lines = [
                ln for ln in plan.splitlines() if "ReusedExchange" in ln
            ]
            assert any("rangepartitioning" in ln for ln in reused_lines)
            results[aqe] = {r.id: r.i for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert results["true"] == results["false"]
    # and the ranks are the exact total order
    want = {
        row.id: i + 1
        for i, row in enumerate(
            sorted(df.collect(), key=lambda r: (r.v, r.id))
        )
    }
    assert results["true"] == want


def test_exact_group_percentiles_single_range_exchange_and_aqe_stable(spark):
    """The fact-scale exact-percentile query rides the same reuse
    invariant (its ranks and offsets must see one partitioning): one
    materialized range exchange in the executed plan, stable results
    under AQE on/off (round-9 verdict ask #7)."""
    from ug_dwh_etl_spark.queries.relational_ext import (
        agg_exact_group_percentiles,
    )

    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    vals = {}
    try:
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            out = agg_exact_group_percentiles(spark, sf)
            plan = _final_plan(out)
            assert plan.count("+- Exchange rangepartitioning") == 1, (
                f"AQE={aqe}: range exchange not shared"
            )
            vals[aqe] = {
                r.l_returnflag: (r.n, r.p25, r.p50, r.p75, r.p99)
                for r in out.collect()
            }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert vals["true"] == vals["false"]


def test_ntile_from_rank_exact_past_double_precision(spark):
    """ntile_from_rank must use integral division: at counts past 2^53
    the old double-division form mis-buckets by one (round-9 ADVICE).
    Drive the closed form directly with a synthetic huge n."""
    from ug_dwh_etl_spark.operators.ranking import ntile_from_rank

    n = 9_007_199_254_740_995  # odd, > 2^53: double cannot represent it
    k = 2
    # ranks just below/at/above the bucket boundary ceil-split:
    # first n%k=1 bucket holds n//k+1 rows -> boundary at n//k+1
    b = n // k + 1
    df = spark.createDataFrame(
        [(b - 1,), (b,), (b + 1,)], "r long"
    ).select(
        "r",
        ntile_from_rank(F.col("r"), F.lit(n).cast("long"), k).alias("t"),
    )
    got = {r.r: r.t for r in df.collect()}
    assert got == {b - 1: 1, b: 1, b + 1: 2}


def test_scan_point_bloom_skips_files(spark, tmp_path):
    """Bloom point-lookup planning: 8 appends each holding a DISJOINT
    high-cardinality key set (every file's [min,max] on a scattered
    surrogate would overlap, but the blooms don't) — a point lookup
    must read ~1 file, never lose rows, and a missing key must read
    ~0 files (false positives allowed, bounded)."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    for i in range(8):
        t.commit_append(
            spark.range(i * 1000, (i + 1) * 1000)
            .select(F.col("id").alias("k"), F.lit(i).alias("v"))
            .coalesce(1),
            bloom_cols=("k",),
        )
    df, read, total = t.scan_point(spark, "k", 4321)
    assert total == 8
    assert read <= 2, f"bloom failed to prune: read {read}/8"
    rows = df.filter(F.col("k") == 4321).collect()
    assert len(rows) == 1 and rows[0].v == 4  # 4321 lives in append #4
    # absent key: every file may legitimately false-positive at ~2%,
    # so allow a small number but not a full scan
    _, read0, _ = t.scan_point(spark, "k", 777_777)
    assert read0 <= 2
    # conservative without blooms: a stats-less commit is always read
    t.commit_append(
        spark.range(50_000, 50_010).select(
            F.col("k") if False else F.col("id").alias("k"), F.lit(9).alias("v")
        ).coalesce(1)
    )
    df2, read2, total2 = t.scan_point(spark, "k", 50_005)
    assert total2 == 9 and read2 >= 1
    assert df2.filter(F.col("k") == 50_005).count() == 1


def test_scan_point_composes_with_merge_on_read(spark, tmp_path):
    """A bloom point read still applies sequence-scoped equality
    deletes: upserting the needle's key must surface the NEW row."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(
        _kv(spark, 0, 1000).coalesce(1), bloom_cols=("k",), stats_cols=("k",)
    )
    t.commit_merge_on_read(
        _kv(spark, 500, 501, v=7).coalesce(1),
        key_cols=["k"],
        bloom_cols=("k",),
        stats_cols=("k",),
    )
    df, read, total = t.scan_point(spark, "k", 500)
    got = df.filter(F.col("k") == 500).collect()
    assert [(r.k, r.v) for r in got] == [(500, 7)]


def test_zorder_box_prunes_more_files_than_1d_clustering(spark, tmp_path):
    """The point of Z-order, measured on the manifest: a predicate on
    the SECOND clustered column prunes files under the Morton layout
    and cannot prune at all under 1-D range clustering; the 2-D box
    composes both axes. Exact filtered relations either way."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable
    from ug_dwh_etl_spark.operators.storage import zorder_frame

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") * 7919 % 365).alias("d"),
        F.col("id").alias("v"),
    )
    z = SnapshotTable(str(tmp_path / "z"))
    z.commit_overwrite(
        zorder_frame(df, "x", "d", n_files=16), stats_cols=("x", "d")
    )
    c = SnapshotTable(str(tmp_path / "c"))
    c.commit_overwrite(
        df.repartitionByRange(16, "x").sortWithinPartitions("x"),
        stats_cols=("x", "d"),
    )
    # the decisive case: a predicate on the NON-leading column only —
    # the 1-D layout can never prune it (every x-sorted file spans the
    # full d range), the Morton layout must
    dbox = {"d": (100, 190)}
    zdf, zread, ztot = z.scan_pruned_multi(spark, dbox)
    cdf, cread, ctot = c.scan_pruned_multi(spark, dbox)
    assert ztot == ctot == 16
    assert cread == 16, "1-D layout unexpectedly pruned its trailing col"
    assert zread < 16, f"zorder failed to prune on d: read {zread}/16"
    pred = F.col("d").between(100, 190)
    want = sorted(r.v for r in df.filter(pred).collect())
    assert sorted(r.v for r in zdf.filter(pred).collect()) == want
    assert sorted(r.v for r in cdf.filter(pred).collect()) == want
    # and the 2-D box composes: both axes contribute skips and no rows
    # are lost (zorder trades a coarser x for pruning power on BOTH)
    box = {"x": (80, 120), "d": (100, 190)}
    zdf2, zread2, _ = z.scan_pruned_multi(spark, box)
    assert zread2 <= zread  # adding the x bound can only shrink the read
    pred2 = F.col("x").between(80, 120) & F.col("d").between(100, 190)
    want2 = sorted(r.v for r in df.filter(pred2).collect())
    assert sorted(r.v for r in zdf2.filter(pred2).collect()) == want2


# --- CDC / incremental reads -------------------------------------------------


def test_read_incremental_scans_only_added_dirs(spark, tmp_path):
    """Append-only incremental read returns exactly the rows the range's
    commits added, and its plan touches none of the pre-existing data
    dirs (the manifest picks the dirs — O(increment), not O(table))."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 100))          # s1: base
    t.commit_append(_kv(spark, 100, 150, v=2))      # s2
    t.commit_append(_kv(spark, 150, 170, v=3))      # s3
    inc = t.read_incremental(spark, from_id=1, to_id=3)
    got = {r.k: r.v for r in inc.collect()}
    assert len(got) == 70 and got[100] == 2 and got[169] == 3
    s1_dir = t.manifest(1)["data_dirs"][-1]
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert s1_dir not in plan, "incremental read scanned the base dir"
    # empty range: empty frame, table schema
    assert t.read_incremental(spark, from_id=3).count() == 0
    # a rewrite inside the range must refuse, not silently mis-read
    t.commit_overwrite(_kv(spark, 0, 10))           # s4
    with pytest.raises(ValueError, match="not append-only"):
        t.read_incremental(spark, from_id=1, to_id=4)


def test_read_changes_append_and_mor(spark, tmp_path):
    """Changelog over append + merge-on-read: appends surface as
    inserts; a MOR upsert surfaces as inserts (new rows) plus deletes
    (the pre-image rows resolved from the parent state), each tagged
    with the committing snapshot."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 50))                 # s1
    t.commit_append(_kv(spark, 50, 60, v=2))              # s2
    t.commit_merge_on_read(_kv(spark, 40, 45, v=9), key_cols=["k"])  # s3
    ch = t.read_changes(spark, from_id=1, to_id=3)
    rows = [
        ((r.k, r.v), r._change_type, r._commit_snapshot_id)
        for r in ch.collect()
    ]
    ins2 = {kv for kv, typ, s in rows if s == 2 and typ == "insert"}
    assert ins2 == {(k, 2) for k in range(50, 60)}
    ins3 = {kv for kv, typ, s in rows if s == 3 and typ == "insert"}
    del3 = {kv for kv, typ, s in rows if s == 3 and typ == "delete"}
    assert ins3 == {(k, 9) for k in range(40, 45)}
    assert del3 == {(k, 1) for k in range(40, 45)}, "pre-images wrong"
    assert len(rows) == 20
    # folding the changelog onto the s1 state reproduces the s3 state
    base = {r.k: r.v for r in t.read_as_of(spark, 1).collect()}
    for (k, v), typ, _ in rows:
        if typ == "insert":
            base[k] = v
        elif base.get(k) == v:
            del base[k]
    want = {r.k: r.v for r in t.read_as_of(spark, 3).collect()}
    assert base == want


def test_read_changes_nets_rewrites(spark, tmp_path):
    """A copy-on-write rewrite diffs as NET changes: carried-forward
    rows cancel, so an overwrite that re-lands 90% of the table reports
    only the 10% that changed — and a compaction reports nothing."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 100))                       # s1
    # s2 rewrites the whole table but only changes keys 0..9 (v 1->5)
    new = _kv(spark, 0, 10, v=5).unionByName(_kv(spark, 10, 100))
    t.commit_overwrite(new)                                      # s2
    ch = [
        ((r.k, r.v), r._change_type)
        for r in t.read_changes(spark, from_id=1, to_id=2).collect()
    ]
    assert {kv for kv, typ in ch if typ == "insert"} == {
        (k, 5) for k in range(10)
    }
    assert {kv for kv, typ in ch if typ == "delete"} == {
        (k, 1) for k in range(10)
    }
    # MOR upsert then compaction: the compact snapshot nets to empty
    t.commit_merge_on_read(_kv(spark, 20, 25, v=7), key_cols=["k"])  # s3
    t.compact_deletes(spark)                                         # s4
    assert t.read_changes(spark, from_id=3, to_id=4).count() == 0
    # and an expired snapshot inside the window raises, never mis-reads
    t.expire_snapshots(keep_from=4)
    with pytest.raises(ValueError, match="expired"):
        t.read_changes(spark, from_id=1, to_id=4)


# --- schema evolution --------------------------------------------------------


def test_schema_evolution_rename_add_drop(spark, tmp_path):
    """Metadata-only DDL: rename resolves old dirs through field ids,
    add back-fills typed nulls on pre-existing dirs, drop hides the
    physical column — and time travel to a pre-DDL snapshot still
    serves the old shape. No data file is rewritten by any of it."""
    import glob as _glob

    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 10))                        # s1
    files_before = sorted(_glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    t.rename_column("v", "val")                                  # s2
    t.add_column("tag", "string")                                # s3
    t.commit_append(
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.lit(2).cast("long").alias("val"),
            F.lit("new").alias("tag"),
        )
    )                                                            # s4
    files_after = sorted(_glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    assert files_before == [f for f in files_after if "s1-" in f], (
        "schema DDL rewrote data files"
    )
    cur = t.read_as_of(spark)
    assert cur.columns == ["k", "val", "tag"]
    got = {r.k: (r.val, r.tag) for r in cur.collect()}
    assert got[0] == (1, None), "old dir didn't project rename+null"
    assert got[12] == (2, "new")
    assert len(got) == 15
    # time travel: the pre-rename snapshot still reads the old names
    old = t.read_as_of(spark, 1)
    assert old.columns == ["k", "v"]
    # drop hides the column everywhere current, keeps it in history
    t.drop_column("tag")                                         # s5
    assert t.read_as_of(spark).columns == ["k", "val"]
    assert t.read_as_of(spark, 4).columns == ["k", "val", "tag"]
    # re-adding the name yields a FRESH field id: no value resurrection
    t.add_column("tag", "string")                                # s6
    assert [r.tag for r in t.read_as_of(spark).collect()] == [None] * 15


def test_schema_evolution_composes_with_mor_deletes(spark, tmp_path):
    """A key column renamed AFTER a merge-on-read commit: the delete
    file keeps its write-time column name, the anti-join resolves the
    current name through the recorded field ids."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_kv(spark, 0, 20))                        # s1
    t.commit_merge_on_read(_kv(spark, 5, 8, v=9), key_cols=["k"])  # s2
    t.rename_column("k", "key_id")                               # s3
    got = {r.key_id: r.v for r in t.read_as_of(spark).collect()}
    assert len(got) == 20 and got[5] == 9 and got[0] == 1
    # incremental read after the rename projects the new name too
    inc = t.read_incremental(spark, from_id=2, to_id=3)
    assert inc.columns == ["key_id", "v"] and inc.count() == 0


# --- duplicated_substring_spans ------------------------------------------------


def _spans(spark, rows, n=4):
    from ug_dwh_etl_spark.operators.dedup import duplicated_substring_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_substring_spans(df, "doc_id", "text", n)
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in out.collect()
    }


def test_substring_spans_cross_doc_duplicate(spark):
    # "a b c d" (4 tokens = n) appears in both docs at different offsets
    rows = [
        (1, "a b c d x y z w"),
        (2, "p q a b c d r s"),
    ]
    assert _spans(spark, rows) == {(1, 1, 4, 4), (2, 3, 6, 4)}


def test_substring_spans_merge_overlapping_grams(spark):
    # a 6-token shared run yields 3 overlapping 4-grams per doc that
    # must merge back into ONE maximal span covering all 6 tokens
    rows = [
        (1, "a b c d e f x y"),
        (2, "z w a b c d e f"),
    ]
    assert _spans(spark, rows) == {(1, 1, 6, 6), (2, 3, 8, 6)}


def test_substring_spans_self_repetition_counts(spark):
    # the same 4-gram twice INSIDE one doc is a duplicate (boilerplate
    # loops); two non-adjacent spans must NOT merge (gap > 0 between
    # token 4 and token 9)
    rows = [(1, "a b c d x y z w a b c d")]
    assert _spans(spark, rows) == {(1, 1, 4, 4), (1, 9, 12, 4)}


def test_substring_spans_adjacent_spans_merge(spark):
    # duplicated grams at starts 1 and 5 with n=4 touch (span [1,4] and
    # [5,8] are adjacent: start 5 == prev 1 + n) -> one span [1,8]
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d q r s t"),
        (3, "w v e f g h u x"),
    ]
    got = _spans(spark, rows)
    assert (1, 1, 8, 8) in got
    assert (1, 1, 4, 4) not in got and (1, 5, 8, 4) not in got


def test_substring_spans_short_and_unique_docs_empty(spark):
    rows = [
        (1, "a b c"),  # shorter than n -> no grams
        (2, "unique tokens only here nothing repeats at all"),
    ]
    assert _spans(spark, rows) == set()


def test_substring_savings_accounts_all_docs(spark):
    from ug_dwh_etl_spark.queries.dedup import _SS_N  # noqa: F401

    # sanity at fixture scale: denominators include gram-less docs
    from ug_dwh_etl_spark.queries.registry import QUERIES

    out = QUERIES["dedup_substring_savings"].fn(
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.duplicated_share <= 1.0
        assert r.tokens_duplicated <= r.tokens_total
        assert r.n_docs_hit <= r.n_docs


# --- write-audit-publish ---------------------------------------------------------


def _mk(spark, vals):
    return spark.createDataFrame([(v, f"r{v}") for v in vals], "k long, v string")


def test_wap_staged_invisible_then_published(spark, tmp_path):
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "wap1"))
    t.commit_overwrite(_mk(spark, [1, 2]))
    t.stage_append(_mk(spark, [3, 4]), branch="audit")
    # main readers see only the published snapshot while staged
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 2}
    # the branch read (the audit) sees published + staged
    assert {r.k for r in t.read_as_of(spark, branch="audit").collect()} == {
        1, 2, 3, 4,
    }
    head = t.publish_branch("audit")
    assert t.latest_snapshot_id() == head == 2
    assert t.branch_head("audit") is None
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 2, 3, 4}


def test_wap_multi_commit_branch_publishes_dense_history(spark, tmp_path):
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "wap2"))
    t.commit_overwrite(_mk(spark, [1]))
    t.stage_append(_mk(spark, [2]), branch="b")
    t.stage_append(_mk(spark, [3]), branch="b")
    assert t.branch_head("b") == 3
    t.publish_branch("b")
    ids = [m["snapshot_id"] for m in t.snapshots()]
    assert ids == [1, 2, 3]
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 2, 3}
    # incremental read over the published range works (dense ids)
    got = {r.k for r in t.read_incremental(spark, from_id=1).collect()}
    assert got == {2, 3}


def test_wap_drop_branch_cleans_and_reuses_ids(spark, tmp_path):
    import os

    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    root = tmp_path / "wap3"
    t = SnapshotTable(str(root))
    t.commit_overwrite(_mk(spark, [1]))
    t.stage_append(_mk(spark, [99]), branch="audit")
    staged_dirs = [
        d
        for d, seq in t.manifest(2).get("dir_seqs", {}).items()
        if seq == 2
    ]
    deleted = t.drop_branch("audit")
    assert set(deleted) == set(staged_dirs)
    assert not os.path.exists(str(root / "manifests" / "v2.json"))
    assert t.branch_head("audit") is None
    # the reclaimed id keeps published history dense after a clean retry
    t.stage_append(_mk(spark, [2]), branch="audit")
    assert t.branch_head("audit") == 2
    t.publish_branch("audit")
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 2}


def test_wap_publish_refuses_non_fast_forward(spark, tmp_path):
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "wap4"))
    t.commit_overwrite(_mk(spark, [1]))
    t.stage_append(_mk(spark, [2]), branch="audit")
    # a concurrent main commit invalidates the staged fast-forward;
    # id allocation must also not collide with the staged manifest
    t.commit_append(_mk(spark, [5]))
    assert t.latest_snapshot_id() == 3
    with pytest.raises(ValueError, match="does not descend"):
        t.publish_branch("audit")
    # main is intact
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 5}


def test_wap_branch_on_empty_table(spark, tmp_path):
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "wap5"))
    t.stage_append(_mk(spark, [1]), branch="init")
    assert t.latest_snapshot_id() is None
    t.publish_branch("init")
    assert t.latest_snapshot_id() == 1
    assert {r.k for r in t.read_as_of(spark).collect()} == {1}


def test_remove_orphan_files(spark, tmp_path):
    import os

    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    root = tmp_path / "gc"
    t = SnapshotTable(str(root))
    t.commit_overwrite(_mk(spark, [1, 2]))
    t.stage_append(_mk(spark, [3]), branch="wip")  # staged = referenced
    # fake a crashed writer: a data dir with no manifest
    orphan = root / "data" / "s99-deadbeef"
    os.makedirs(orphan)
    (orphan / "part-00000.parquet").write_bytes(b"junk")
    # grace window protects a just-written dir (the in-flight commit race)
    assert t.remove_orphan_files() == []
    deleted = t.remove_orphan_files(grace_seconds=0)
    assert deleted == ["data/s99-deadbeef"]
    assert not orphan.exists()
    # referenced dirs (published AND staged) survived
    assert {r.k for r in t.read_as_of(spark).collect()} == {1, 2}
    assert {r.k for r in t.read_as_of(spark, branch="wip").collect()} == {
        1, 2, 3,
    }


def test_stream_wap_ingest_blocks_junk(spark):
    import pyspark.sql.functions as F  # noqa: F811

    from ug_dwh_etl_spark.streaming.jobs import stream_wap_gated_ingest

    sf = "/root/testdata/sf0.001"
    out = stream_wap_gated_ingest(spark, sf)
    got = {(r.o_orderstatus, r.n_orders) for r in out.collect()}
    o = spark.read.parquet(f"{sf}/orders.parquet").filter(
        F.col("o_orderdate") < "1997-01-01"
    )
    want = {
        (r.o_orderstatus, r.n_orders)
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    assert got == want


def test_epoch_shuffle_balanced_and_epoch_sensitive(spark):
    from ug_dwh_etl_spark.queries.registry import QUERIES

    rows = QUERIES["corpus_epoch_shuffle"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {1, 2}
    tot = {e: sum(r.n_docs for r in rs) for e, rs in by_epoch.items()}
    # no doc lost between epochs
    assert tot[1] == tot[2]
    # the reshuffle actually reshuffles: shard checksums differ
    cks = {e: sorted(r.h_checksum for r in rs) for e, rs in by_epoch.items()}
    assert cks[1] != cks[2]


def test_unimax_waterfill_invariants(spark):
    """UniMax allocation laws: (a) every allocation respects the epoch
    cap, (b) saturated languages take exactly their capacity, (c) all
    non-saturated languages share ONE water level, and (d) the budget
    is exactly exhausted whenever at least one language is unsaturated
    (waterfill conservation)."""
    from ug_dwh_etl_spark.queries.registry import QUERIES
    from ug_dwh_etl_spark.queries.textstats import _UNIMAX_BUDGET_EPOCHS

    rows = QUERIES["corpus_unimax_budget"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "no languages"
    budget = sum(r.n_chars for r in rows) * _UNIMAX_BUDGET_EPOCHS
    for r in rows:
        assert r.alloc_chars <= r.capacity + 1e-6
        if r.saturated:
            assert r.alloc_chars == pytest.approx(float(r.capacity))
    levels = {round(r.alloc_chars, 4) for r in rows if not r.saturated}
    assert len(levels) <= 1, f"non-saturated languages at different levels: {levels}"
    if levels:  # someone absorbs the leftover -> budget exactly spent
        assert sum(r.alloc_chars for r in rows) == pytest.approx(budget, rel=1e-9)


def test_partition_spec_evolution(spark, tmp_path):
    """Iceberg partition evolution: dir 1 unpartitioned, dir 2 written
    under an identity day-spec, dir 3 under a (day, region) spec — old
    dirs are never rewritten, reads reconcile all three layouts to ONE
    schema with partition values restored and re-typed from the tracked
    schema (not directory-name inference), and manifest-stats pruning
    keeps working across mixed specs."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    def mk(lo, hi, day, region):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.lit(day).alias("day"),
            F.lit(region).alias("region"),
            (F.col("id") * 10).alias("v"),
        )

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(mk(0, 100, "2024-01-01", "eu"), stats_cols=("k",))
    t.commit_append(
        mk(100, 200, "2024-01-02", "us"),
        stats_cols=("k",),
        partition_by=("day",),
    )
    t.commit_append(
        mk(200, 300, "2024-01-03", "ap"),
        stats_cols=("k",),
        partition_by=("day", "region"),
    )
    df = t.read_as_of(spark)
    # one logical schema across three physical layouts, day stays STRING
    assert [f.name for f in df.schema.fields] == ["k", "day", "region", "v"]
    assert dict(df.dtypes)["day"] == "string"
    rows = {r.k: (r.day, r.region, r.v) for r in df.collect()}
    assert len(rows) == 300
    assert rows[50] == ("2024-01-01", "eu", 500)
    assert rows[150] == ("2024-01-02", "us", 1500)
    assert rows[250] == ("2024-01-03", "ap", 2500)

    # stats pruning spans mixed specs: a [120, 130] scan reads only the
    # day-spec dir's files, never dir 1 or dir 3
    pruned, files_read, files_total = t.scan_pruned(spark, "k", "120", "130")
    got = sorted(r.k for r in pruned.filter(
        (F.col("k") >= 120) & (F.col("k") <= 130)).collect())
    assert got == list(range(120, 131))
    assert 0 < files_read < files_total

    # spec evolution composes with merge-on-read deletes: upsert into
    # the partitioned era, read back reconciled
    t.commit_merge_on_read(
        mk(150, 160, "2024-01-02", "us").withColumn("v", F.lit(-1)),
        key_cols=["k"],
        stats_cols=("k",),
    )
    got2 = {r.k: r.v for r in t.read_as_of(spark).collect()}
    assert len(got2) == 300 and got2[155] == -1 and got2[50] == 500


def test_bloom_point_lookup_on_partitioned_dir(spark, tmp_path):
    """Bloom manifest metrics compose with a partition spec: per-file
    bitmaps collected under day= subdirs still skip files on point
    lookups, and the file-subset read restores partition values."""
    from ug_dwh_etl_spark.operators.snapshot_table import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, "2024-01-01").otherwise("2024-01-02").alias("day"),
    ).repartition(4, "k")
    t.commit_overwrite(df, bloom_cols=("k",), partition_by=("day",))
    got, files_read, files_total = t.scan_point(spark, "k", 1500)
    rows = got.filter(F.col("k") == 1500).collect()
    assert len(rows) == 1 and rows[0].day == "2024-01-02"
    assert 0 < files_read < files_total
