"""Declarative data-quality expectations — the validation gate a training
pipeline runs before (and after) every materialization.

Rules compile to ONE aggregation pass over the relation (each rule is a
``sum(case when violated then 1 end)`` column), so a 10^12-row validation
costs a single map-side-combined scan; the uniqueness rule is the only one
needing a shuffle (count vs count distinct on the key). Output is a tidy
``(rule, n_violations, passed)`` relation, SQL-oracle-able and joinable
into lineage records. Everything (including :func:`check_reference`) is
LAZY — composing a report runs no jobs until the caller acts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def unique(col: str) -> tuple[str, Column]:
    # sentinel handled specially in validate() — needs an aggregate, not a
    # per-row predicate
    return f"unique({col})", None


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return (f"in_range({col},{lo},{hi})",
            c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)))


def matches(col: str, regex: str) -> tuple[str, Column]:
    # the regex is part of the rule identity: two matches() rules on one
    # column must not collide in the aggregate aliases
    c = F.col(col)
    return (f"matches({col},{regex})", c.isNull() | ~c.rlike(regex))


def one_of(col: str, values) -> tuple[str, Column]:
    vals = list(values)
    c = F.col(col)
    return (f"one_of({col},{'|'.join(str(v) for v in vals)})",
            c.isNull() | ~c.isin(vals))


def validate(df: DataFrame, rules) -> DataFrame:
    """Evaluate every rule; returns ``(rule, n_violations, passed)``.

    Per-row rules fuse into ONE aggregation (a single scan regardless of
    rule count); each ``unique`` rule adds one distinct-count aggregate
    over its key. All JVM expressions — no Python in the pass. An empty
    relation passes vacuously (0 violations, not null). Duplicate rule
    names (same rule + same arguments twice) are rejected up front.
    """
    row_rules = [(n, cond) for n, cond in rules if cond is not None]
    uniq_rules = [n for n, cond in rules if cond is None]
    names = [n for n, _ in row_rules] + uniq_rules
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate rules: {sorted(dupes)}")

    # coalesce: sum() over zero rows is NULL — an empty relation must pass
    # vacuously, matching the unique rules' count-based 0
    aggs = [F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long").alias(name) for name, cond in row_rules]
    for name in uniq_rules:
        col = name[len("unique("):-1]
        aggs.append((F.count(col) - F.countDistinct(col))
                    .cast("long").alias(name))
    wide = df.agg(*aggs)

    esc = lambda n: n.replace("`", "``")  # noqa: E731
    stacked = wide.select(F.stack(
        F.lit(len(names)),
        *[x for n in names for x in (F.lit(n), F.col(f"`{esc(n)}`"))]
    ).alias("rule", "n_violations"))
    return stacked.select(
        "rule", "n_violations",
        (F.col("n_violations") == 0).alias("passed"))


def check_reference(df: DataFrame, col: str, dim: DataFrame,
                    dim_col: str) -> DataFrame:
    """Referential-integrity expectation: rows of ``df`` whose ``col``
    has no match in ``dim.dim_col`` (nulls are orphans too). Same tidy
    ``(rule, n_violations, passed)`` schema as :func:`validate`, so the
    outputs union into one report — LAZILY (no job runs here; a report
    unioning several FK checks executes them under one action).

    Plan shape: LEFT ANTI join against the distinct key projection of the
    dimension — broadcastable when the dimension is small, shuffle-hash
    otherwise; either way a single join, no row explosion.
    """
    orphans = (df.select(F.col(col))
               .join(dim.select(F.col(dim_col).alias(col)).distinct(),
                     on=col, how="left_anti"))
    n = F.count(F.lit(1)).cast("long")
    return orphans.agg(
        F.lit(f"reference({col})").alias("rule"),
        n.alias("n_violations"),
        (n == 0).alias("passed"))


def check_pit(df: DataFrame, label_ts_col: str,
              feature_ts_cols) -> DataFrame:
    """Temporal-leakage audit of an assembled training set: ONE
    scan-and-aggregate emitting, per feature-timestamp column, the
    number of rows where the feature timestamp is STRICTLY AFTER the
    label timestamp (a future row leaked into the feature), the
    worst leak, and the feature staleness spread.

    Output: one row per audited column —
    ``(feature_col, n_rows, n_violations, max_leak, max_lag)`` where
    ``max_leak = max(feature_ts - label_ts)`` over violating rows
    (null when none) and ``max_lag = max(label_ts - feature_ts)`` over
    compliant rows (how stale the oldest served feature is).  Null
    feature timestamps (no as-of match) violate nothing and don't
    enter either extreme.

    The as-of/PIT operators in this engine are leakage-free by
    construction (structural tests pin it); this audit is the runtime
    counterpart for EXTERNALLY produced tables, where "zero temporal
    leakage" must be re-established per delivery — a fused
    aggregation, one pass whatever the column count.
    """
    from ..functions.util import as_list

    cols = as_list(feature_ts_cols)
    if not cols:
        raise ValueError("feature_ts_cols must name at least one column")
    label = F.col(label_ts_col)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        f = F.col(c)
        viol = f.isNotNull() & (f > label)
        aggs += [
            # coalesce: sum over an EMPTY relation is null, and an empty
            # delivery has zero violations, not unknown (r3 review class)
            F.coalesce(F.sum(viol.cast("long")), F.lit(0))
            .alias(f"__nv_{c}"),
            F.max(F.when(viol, f - label)).alias(f"__leak_{c}"),
            F.max(F.when(f.isNotNull() & (f <= label), label - f))
            .alias(f"__lag_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("feature_col"),
                 F.col("n_rows"),
                 F.col(f"__nv_{c}").alias("n_violations"),
                 F.col(f"__leak_{c}").alias("max_leak"),
                 F.col(f"__lag_{c}").alias("max_lag"))
        for c in cols])
    return (one.select(F.explode(per_col).alias("r"))
            .select("r.feature_col", "r.n_rows", "r.n_violations",
                    "r.max_leak", "r.max_lag"))


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-on-read profile of a flat JSON string column: one row per
    key — ``(key, n_present, n_null_value, n_intlike, n_floatlike,
    n_boollike, n_distinct)``.

    Values are compared in their UNQUOTED string form (``from_json``
    as ``map<string,string>``), classified by portable regexes:
    int ``^-?[0-9]+$``, float ``^-?[0-9]*\\.[0-9]+$``, bool
    ``^(true|false)$``.  Rows whose column is null or unparseable
    contribute nothing.  Objects with DUPLICATE keys are OUTSIDE the
    contract: Spark's map parse keeps one last-wins entry while other
    engines (e.g. DuckDB ``json_keys``) enumerate every occurrence —
    flat well-formed metadata with unique keys (``props``-style
    columns) is the supported input, not arbitrary documents.

    Scale notes: one JVM-side parse + explode + map-side-combined
    aggregation per key — |keys|-bounded output, no Python.
    """
    kv = (df.where(F.col(json_col).isNotNull())
          .select(F.explode(F.from_json(F.col(json_col),
                                        "map<string,string>"))
                  .alias("key", "__v")))
    v = F.col("__v")
    return (kv.groupBy("key")
            .agg(F.count("*").alias("n_present"),
                 F.sum(F.when(v.isNull(), 1).otherwise(0))
                 .alias("n_null_value"),
                 F.sum(F.when(v.rlike("^-?[0-9]+$"), 1).otherwise(0))
                 .alias("n_intlike"),
                 F.sum(F.when(v.rlike("^-?[0-9]*\\.[0-9]+$"), 1)
                       .otherwise(0)).alias("n_floatlike"),
                 F.sum(F.when(v.rlike("^(true|false)$"), 1)
                       .otherwise(0)).alias("n_boollike"),
                 F.countDistinct(v).alias("n_distinct")))


def _row_hash(cols):
    """Engine-portable 60-bit row hash: int64 of the first 15 hex chars
    of md5 over the chr(31)-joined column values, nulls encoded as
    chr(0) (DuckDB mirror: ``cast(('0x' || substr(md5(...), 1, 15)) as
    bigint)``).  60 bits keeps the value positive and summable in
    decimal(38,0) for 10^18 rows without overflow."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
             for c in cols]
    s = F.concat_ws("\x1f", *parts)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def table_fingerprint(df: DataFrame, cols=None) -> DataFrame:
    """Order-invariant one-row content fingerprint: ``(n_rows,
    n_distinct_hashes, sum_hash, min_hash, max_hash)`` — two tables
    with equal fingerprints are content-equal as multisets up to hash
    collision (60-bit per row; the SUM adds multiset sensitivity that
    a pure distinct-count check lacks).

    The cheap way to answer "did this 100 TB rebuild produce the same
    table?" without sorting or joining either side: each side computes
    its own fingerprint (one map-side-combined scan, one output row)
    and the two rows are compared.  ``cols`` defaults to every column
    IN NAME ORDER (so projection order doesn't matter); values are
    compared in their string cast — int/string/bool/date columns are
    engine-stable, raw double columns are NOT (format drift) — round
    or quantize floats first (the repo-wide decimal discipline).

    Scale notes: zero shuffle beyond the 1-row aggregation; the hash
    is pure JVM codegen (md5 + conv).
    """
    from ..functions.util import as_list

    use = sorted(df.columns) if cols is None else as_list(cols)
    h = _row_hash(use)
    d = h.cast("decimal(38,0)")
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(h).alias("n_distinct_hashes"),
        F.coalesce(F.sum(d), F.lit(0).cast("decimal(38,0)"))
        .alias("sum_hash"),
        F.min(h).alias("min_hash"),
        F.max(h).alias("max_hash"))


def table_diff_buckets(left: DataFrame, right: DataFrame,
                       n_buckets: int, cols=None) -> DataFrame:
    """Merkle-style locate-the-difference: hash-bucket both tables'
    rows into ``n_buckets`` and return ONLY the buckets whose
    ``(count, hash sum)`` differ — ``(bucket, n_left, n_right,
    sum_left, sum_right)``.

    The scale story: two 10^12-row tables that differ in a handful of
    rows are compared with two map-side-combined scans + one
    |buckets|-sized join; only the differing buckets (each ~n/buckets
    rows) need a deep row-level diff (``changelog.diff_snapshots`` on
    the bucket predicate), instead of a full-table anti-join.  Same
    column/string-cast contract as :func:`table_fingerprint`.

    Equal tables return 0 rows — the empty result IS the equality
    certificate (up to 60-bit collisions within a bucket).
    """
    from ..functions.util import as_list

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if cols is None:
        shared = sorted(set(left.columns) & set(right.columns))
        if sorted(left.columns) != shared or \
                sorted(right.columns) != shared:
            raise ValueError(
                "left/right column sets differ "
                f"({sorted(left.columns)} vs {sorted(right.columns)}); "
                "pass cols explicitly")
        use = shared
    else:
        use = as_list(cols)

    def side(df, tag):
        h = _row_hash(use)
        return (df.select((F.pmod(h, F.lit(n_buckets))).alias("bucket"),
                          h.cast("decimal(38,0)").alias("__h"))
                .groupBy("bucket")
                .agg(F.count("*").alias(f"n_{tag}"),
                     F.sum("__h").alias(f"sum_{tag}")))

    z = F.lit(0).cast("decimal(38,0)")
    j = side(left, "left").join(side(right, "right"), ["bucket"], "full")
    return (j.select("bucket",
                     F.coalesce("n_left", F.lit(0)).alias("n_left"),
                     F.coalesce("n_right", F.lit(0)).alias("n_right"),
                     F.coalesce("sum_left", z).alias("sum_left"),
                     F.coalesce("sum_right", z).alias("sum_right"))
            .where((F.col("n_left") != F.col("n_right"))
                   | (F.col("sum_left") != F.col("sum_right"))))
