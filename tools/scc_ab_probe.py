"""Interleaved A/B probe for graph_scc's inner fixpoint (round 12).

Variant A = the r11 broadcast form (broadcast the |V|-label state into
the edge join, broadcast the pulled minima back). Variant B = the
co-partitioned shuffle form (state stays hash-partitioned on
(node, dir); the per-step join reuses the checkpointed edge relation's
partitioning, the convergence join reuses the state's own partitioning
— zero |V|-sized broadcasts, the 100 TB-safe posture).

Runs A and B alternately N times each inside ONE session so the
comparison is robust to the box's wall-clock drift. Dev probe only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ug_dwh_etl_spark.operators.graph import _LoopConf
from ug_dwh_etl_spark.queries.registry import sfdir_key  # noqa: F401
from ug_dwh_etl_spark.session import get_spark


class Ledger:
    """Track localCheckpoint RDD ids and free superseded generations
    for real (Dataset.unpersist is a no-op on checkpoint blocks;
    rdd.unpersist via getPersistentRDDs is not — verified)."""

    def __init__(self, spark, enabled):
        self._sc = spark.sparkContext._jsc.sc()
        self.enabled = enabled
        self.groups = {}

    def _ids(self):
        out = set()
        it = self._sc.getPersistentRDDs().iterator()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    def ckpt(self, df, tag, eager=True):
        if not self.enabled:
            return df.localCheckpoint(eager=eager)
        before = self._ids()
        ck = df.localCheckpoint(eager=eager)
        self.groups.setdefault(tag, set()).update(self._ids() - before)
        return ck

    def free(self, *tags):
        if not self.enabled:
            return
        ids = set()
        for t in tags:
            ids |= self.groups.pop(t, set())
        if not ids:
            return
        it = self._sc.getPersistentRDDs().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in ids:
                kv._2().unpersist(False)


def scc(spark, edges, lp, variant, led, eager=True):
    import contextlib

    @contextlib.contextmanager
    def conf_c():
        c = spark.conf
        prev = (
            c.get("spark.sql.adaptive.enabled"),
            c.get("spark.sql.join.preferSortMergeJoin", "true"),
        )
        c.set("spark.sql.adaptive.enabled", "false")
        c.set("spark.sql.join.preferSortMergeJoin", "false")
        try:
            yield
        finally:
            c.set("spark.sql.adaptive.enabled", prev[0])
            c.set("spark.sql.join.preferSortMergeJoin", prev[1])

    ctx = conf_c() if variant == "C" else contextlib.nullcontext()
    with _LoopConf(spark, lp, keep_aqe=True), ctx:
        e0 = edges.select(F.col("src").alias("s"), F.col("dst").alias("d"))
        e0 = led.ckpt(e0, "e0")
        nodes = (
            e0.select(F.col("s").alias("node"))
            .union(e0.select(F.col("d").alias("node")))
            .distinct()
        )
        active = led.ckpt(
            nodes.select("node", F.lit("0").alias("color")), "active"
        )

        def dirs_min(ea, act):
            e2 = ea.select("s", "d", F.lit("f").alias("dir")).unionByName(
                ea.select(
                    F.col("d").alias("s"),
                    F.col("s").alias("d"),
                    F.lit("b").alias("dir"),
                )
            )
            if variant in ("B", "C"):
                e2 = e2.repartition(lp, "d", "dir")
            e2 = led.ckpt(e2, "e2", eager=eager)

            def step_a(m):
                pulled = (
                    e2.join(
                        F.broadcast(m),
                        (e2["d"] == m["node"]) & (e2["dir"] == m["dr"]),
                    )
                    .groupBy(F.col("s").alias("n2"), e2["dir"].alias("dr2"))
                    .agg(F.min("m").alias("nm"))
                )
                return m.join(
                    F.broadcast(pulled),
                    (m["node"] == pulled["n2"]) & (m["dr"] == pulled["dr2"]),
                    "left",
                ).select(
                    "node",
                    "dr",
                    F.least(F.col("m"), F.coalesce(F.col("nm"), F.col("m"))).alias(
                        "m"
                    ),
                )

            def step_b(m):
                contrib = (
                    e2.join(m, (e2["d"] == m["node"]) & (e2["dir"] == m["dr"]))
                    .groupBy(F.col("s").alias("node"), e2["dir"].alias("dr"))
                    .agg(F.min("m").alias("m"))
                )
                return (
                    m.select("node", "dr", "m")
                    .unionByName(contrib)
                    .groupBy("node", "dr")
                    .agg(F.min("m").alias("m"))
                )

            step = step_a if variant == "A" else step_b
            m = act.select("node", F.col("node").alias("m")).withColumn(
                "dr", F.explode(F.array(F.lit("f"), F.lit("b")))
            )
            if variant in ("B", "C"):
                m = m.repartition(lp, "node", "dr")
            for _ in range(50):
                m2 = led.ckpt(step(step(m)), "m_new", eager=eager)
                if variant == "A":
                    changed = (
                        m2.alias("a")
                        .join(
                            F.broadcast(m.alias("b")),
                            (F.col("a.node") == F.col("b.node"))
                            & (F.col("a.dr") == F.col("b.dr")),
                        )
                        .filter(F.col("a.m") != F.col("b.m"))
                        .count()
                    )
                else:
                    changed = (
                        m2.alias("a")
                        .join(m.alias("b"), ["node", "dr"])
                        .filter(F.col("a.m") != F.col("b.m"))
                        .count()
                    )
                m = m2
                led.free("m_old")
                led.groups["m_old"] = led.groups.pop("m_new", set())
                if changed == 0:
                    break
            led.free("e2")
            return m

        settled_parts = []
        n_active = active.count()
        while n_active:
            sa = active.select(F.col("node").alias("s"), F.col("color").alias("cs"))
            da = active.select(F.col("node").alias("d"), F.col("color").alias("cd"))
            ea = (
                e0.join(sa, "s")
                .join(da, "d")
                .filter(F.col("cs") == F.col("cd"))
                .select("s", "d")
            )
            mm = dirs_min(ea, active)
            fwd = mm.filter(F.col("dr") == "f").select("node", F.col("m").alias("fmin"))
            bwd = mm.filter(F.col("dr") == "b").select("node", F.col("m").alias("bmin"))
            lab = led.ckpt(active.join(fwd, "node").join(bwd, "node"), "lab", eager=eager)
            settled_parts.append(
                lab.filter(F.col("fmin") == F.col("bmin")).select(
                    "node", F.col("fmin").alias("scc_id")
                )
            )
            active = lab.filter(F.col("fmin") != F.col("bmin")).select(
                "node", F.concat_ws("|", "color", "fmin", "bmin").alias("color")
            )
            n_active = active.count()
        out = settled_parts[0]
        for p in settled_parts[1:]:
            out = out.unionByName(p)
        res = out.localCheckpoint(eager=True)
        # settled parts are filters over lab checkpoints: only free
        # them once the result is materialized; m_old too
        led.free("lab", "m_old", "e0", "active")
        return res


def main():
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else ["A", "Bf"]
    spark = get_spark("scc_ab")
    spark.sparkContext.setLogLevel("ERROR")
    from ug_dwh_etl_spark.queries.graph import _scc_edges

    edges = _scc_edges(spark, sf_dir)

    def run(v):
        # trailing "f" = ledger freeing on
        led = Ledger(spark, "f" in v[1:])
        return scc(spark, edges, 8, v[0], led, eager="l" not in v[1:]).groupBy("scc_id").agg(
            F.count(F.lit(1)).alias("n_members")
        )

    for v in variants:  # warmup
        run(v).write.format("noop").mode("overwrite").save()
    results = {v: [] for v in variants}
    for i in range(n):
        for v in variants:
            t0 = time.perf_counter()
            run(v).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[v].append(round(dt, 3))
            print(f"run{i + 1} {v}: {dt:.3f}s", flush=True)
    checks = {v: sorted(map(tuple, run(v).collect())) for v in variants}
    print("results_equal:", len({str(c) for c in checks.values()}) == 1)
    for v in variants:
        print(v, "min:", min(results[v]), "runs:", results[v])


if __name__ == "__main__":
    main()
