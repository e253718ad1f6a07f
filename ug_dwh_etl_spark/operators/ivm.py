"""Incremental view maintenance (IVM) for JOIN views.

The aggregate side of IVM lives in ``streaming.jobs.merge_rollup_delta``
(monoid rollups merged per delta); this is the JOIN side: a
materialized view V = A ⋈ B is maintained under inserts with the
bilinear delta rule

    Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

so refreshing V costs joins whose left or right side is a DELTA —
O(|Δ|·matches) work per refresh instead of re-joining the full bases.
At 100 TB both bases are bucketed on the join key
(``operators/bucketing``) and each delta term is a co-located or
broadcast join against one base; the view itself appends Δ via the
history sink. Deletes/updates extend the same algebra with counted
(multiset) rows — not needed for the append-only reference pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """Rows ADDED to the inner-join view A ⋈ B when ΔA and ΔB arrive.

    Exactness is algebraic: (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) distributes
    into four terms, of which A_old ⋈ B_old is already materialized —
    the other three are the delta. The driver-gate query
    ``ivm_join_view`` proves old-view ∪ this-delta equals the direct
    full join against the DuckDB oracle."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        a_delta.join(b_old, keys)
        .unionByName(a_old.join(b_delta, keys))
        .unionByName(a_delta.join(b_delta, keys))
    )


def refresh_join_view(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str] | str,
) -> DataFrame:
    """The maintained view after one refresh: previously materialized
    A_old ⋈ B_old plus the three delta terms."""
    keys = [on] if isinstance(on, str) else list(on)
    return a_old.join(b_old, keys).unionByName(
        join_view_delta(a_old, a_delta, b_old, b_delta, keys)
    )
