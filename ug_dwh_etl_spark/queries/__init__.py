"""Query registry: the driver-facing coverage surface.

Each module registers named queries — a PySpark callable
``(spark, sf_dir) -> DataFrame`` paired with an equivalent DuckDB oracle
SQL string (or None for genuinely non-SQL-expressible operators, which
get the driver's weaker rows-only check).

Parity rules (SURVEY.md §5):
- alias every computed column identically on both sides;
- round double aggregates (sum order differs across engines at the ulp);
- compare dates as DATE, not timestamp;
- deterministic tiebreaks on every top-k / window rank.
"""

from ug_dwh_etl_spark.queries.registry import QUERIES, register, table
import ug_dwh_etl_spark.queries.relational  # noqa: F401
import ug_dwh_etl_spark.queries.macros  # noqa: F401
import ug_dwh_etl_spark.queries.events  # noqa: F401
import ug_dwh_etl_spark.queries.dedup  # noqa: F401
import ug_dwh_etl_spark.queries.similarity  # noqa: F401
import ug_dwh_etl_spark.queries.textstats  # noqa: F401
import ug_dwh_etl_spark.queries.pipelines  # noqa: F401
import ug_dwh_etl_spark.queries.streaming  # noqa: F401
import ug_dwh_etl_spark.queries.multimodal  # noqa: F401
import ug_dwh_etl_spark.queries.relational_ext  # noqa: F401
import ug_dwh_etl_spark.queries.graph  # noqa: F401
import ug_dwh_etl_spark.queries.scale  # noqa: F401
import ug_dwh_etl_spark.queries.relational_tpch  # noqa: F401
import ug_dwh_etl_spark.queries.adhoc_sql  # noqa: F401
import ug_dwh_etl_spark.queries.pipelines_ext  # noqa: F401
import ug_dwh_etl_spark.queries.history  # noqa: F401
import ug_dwh_etl_spark.queries.relational_tpch2  # noqa: F401
import ug_dwh_etl_spark.queries.mlfit  # noqa: F401
import ug_dwh_etl_spark.queries.semantic  # noqa: F401
import ug_dwh_etl_spark.queries.entity  # noqa: F401

__all__ = ["QUERIES", "register", "table"]
