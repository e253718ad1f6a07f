"""ug_dwh_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference warehouse ETL (curarin/ug-dwh-etl), rebuilt
on the DataFrame / Spark SQL / Catalyst stack:

- ``sources``    — schema-registered readers + pluggable staging connectors
                   (the reference's Drive/IMAP/REST fetch surface).
- ``sinks``      — append/overwrite/partitioned writers, multi-sink fan-out,
                   alert hooks (the reference's BigQuery + Teams surface).
- ``functions``  — the expression-macro library: every scalar transform the
                   reference performs as a pandas ``.apply`` lambda,
                   re-expressed as native Column expressions (zero Python
                   UDFs on this surface).
- ``operators``  — relational extensions (as-of join, top-k, dq gates) and
                   the LLM-data-pipeline operators (dedup, similarity
                   search, text analysis, multimodal plumbing).
- ``plans``      — declarative Pipeline composition (read → transform →
                   fan-out write) mirroring the reference's script shape.
- ``streaming``  — the incremental surface: Trigger.AvailableNow file
                   streams, watermarked windows, stream dedup.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
