"""Privacy / governance checks over training tables.

Complements ``text.pii_metrics``/``redact_pii`` (content-level PII)
with TABLE-level re-identification risk: k-anonymity over a
quasi-identifier column set.  A row is k-anonymous when at least
``k - 1`` other rows share its full quasi-identifier combination;
groups smaller than ``k`` are re-identification candidates and must be
suppressed or generalized before release.

Scale notes: one map-side-combined groupBy on the quasi-identifier
tuple (output bounded by distinct combinations); the summary is a
second, |combinations|-bounded aggregation.  Null quasi-identifier
values group as their own value (null-safe grouping is Spark/SQL
default) — "unknown ZIP" is itself a quasi-identifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.util import as_list


def k_anonymity_groups(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """Per-combination view: the quasi-identifier columns plus
    ``(n_rows, is_violation)`` — ``is_violation`` true when the
    combination has fewer than ``k`` rows."""
    cols = as_list(quasi_cols)
    if not cols:
        raise ValueError("quasi_cols must name at least one column")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (df.groupBy(*cols)
            .agg(F.count("*").alias("n_rows"))
            .withColumn("is_violation", F.col("n_rows") < k))


def k_anonymity_report(df: DataFrame, quasi_cols, k: int) -> DataFrame:
    """One-row summary: ``(n_rows, n_groups, n_violating_groups,
    n_violating_rows, min_group, is_k_anonymous)``.  ``min_group`` is
    the smallest combination size (the table's actual k); the table is
    k-anonymous iff ``min_group >= k``.  Empty input: zero counts,
    null ``min_group``, vacuously k-anonymous."""
    g = k_anonymity_groups(df, quasi_cols, k)
    z = lambda c: F.coalesce(c, F.lit(0))  # noqa: E731  (empty relation)
    return (g.agg(
        z(F.sum("n_rows")).alias("n_rows"),
        F.count("*").alias("n_groups"),
        z(F.sum(F.col("is_violation").cast("long")))
        .alias("n_violating_groups"),
        z(F.sum(F.when(F.col("is_violation"), F.col("n_rows"))))
        .alias("n_violating_rows"),
        F.min("n_rows").alias("min_group"))
        .withColumn("is_k_anonymous",
                    F.coalesce(F.col("min_group") >= k, F.lit(True))))


def l_diversity_groups(df: DataFrame, quasi_cols, sensitive_col: str,
                       l: int) -> DataFrame:  # noqa: E741
    """Per-quasi-identifier-combination diversity view: the QI columns
    plus ``(n_rows, n_sensitive, is_violation)`` — a combination
    violates l-diversity when its rows expose fewer than ``l`` DISTINCT
    sensitive values (k-anonymity's blind spot: a size-100 group whose
    members all share one diagnosis re-identifies the attribute even
    though no individual row does).  Null sensitive values do not count
    toward diversity (``countDistinct`` SQL semantics — an unknown
    value discloses nothing, so it cannot defend a group either)."""
    cols = as_list(quasi_cols)
    if not cols:
        raise ValueError("quasi_cols must name at least one column")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    return (df.groupBy(*cols)
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct(sensitive_col).alias("n_sensitive"))
            .withColumn("is_violation", F.col("n_sensitive") < l))


def l_diversity_report(df: DataFrame, quasi_cols, sensitive_col: str,
                       l: int) -> DataFrame:  # noqa: E741
    """One-row summary: ``(n_rows, n_groups, n_violating_groups,
    n_violating_rows, min_l, is_l_diverse)`` — ``min_l`` is the least
    diverse combination's distinct-sensitive count (the table's actual
    l).  Same single groupBy + |combinations|-bounded reduction shape
    as :func:`k_anonymity_report`; empty input is vacuously diverse."""
    g = l_diversity_groups(df, quasi_cols, sensitive_col, l)
    z = lambda c: F.coalesce(c, F.lit(0))  # noqa: E731  (empty relation)
    return (g.agg(
        z(F.sum("n_rows")).alias("n_rows"),
        F.count("*").alias("n_groups"),
        z(F.sum(F.col("is_violation").cast("long")))
        .alias("n_violating_groups"),
        z(F.sum(F.when(F.col("is_violation"), F.col("n_rows"))))
        .alias("n_violating_rows"),
        F.min("n_sensitive").alias("min_l"))
        .withColumn("is_l_diverse",
                    F.coalesce(F.col("min_l") >= l, F.lit(True))))
