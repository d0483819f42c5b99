"""Entity resolution: blocking + edit-distance candidate pairs.

Fuzzy-matching every record against every record is O(n²); real ER at
10^9 rows is *blocking* — a cheap deterministic key that co-locates
likely matches — followed by an expensive verifier (here Levenshtein)
run only inside blocks.  This module implements *rarest-word blocking*:
each record's block is the corpus-rarest word of its name (document
frequency ascending, word ascending as tiebreak).  Rare words make
small blocks, and two near-duplicate names almost always share their
rarest word, so the candidate join stays near-linear.

Recall contract (documented, not hidden): a pair is surfaced only if
BOTH records pick the same rarest word.  Near-duplicates whose edit
difference sits exactly in the rarest word are missed — the standard
single-key blocking tradeoff; run a second pass with ``rank=2`` keys
(or union several) for higher recall.  Records whose name is null /
empty / whitespace-only have no words, get no block, and emit no pairs.

Scale notes: word document-frequencies are one map-side-combined
aggregation bounded by |vocabulary|; the rarest-word pick is an
aggregate ``min(struct(df, word))`` — NO window, no second shuffle on
the record table; the self-join shuffles on the block key, and
``max_block`` drops blocks above a size cap (stopword-ish block keys
would otherwise quadratically explode — the same guard discipline as
``dedup``'s ``star_over``).  Each record holds exactly ONE block, so
emitted pairs are unique by construction — no distinct needed.

Reference parity: the reference deduplicates/merges near-identical GMM
components by pairwise distance within a sorted neighborhood
(``components/spectrum/model.py`` merge step); this is the same
"block, then pairwise-verify" shape over string payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared with operators.lm: explicit class, not \s (Java-vs-RE2 \x0B skew)
from .lm import WS_CLASS


def _words(text_col: str):
    """Distinct lowercased whitespace words of a name — the blocking
    vocabulary.  Null text yields an empty array (no block)."""
    return F.array_distinct(F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                WS_CLASS),
        lambda w: w != F.lit("")))


def rarest_word_blocks(df: DataFrame, text_col: str,
                       id_col: str) -> DataFrame:
    """One row per blockable record: ``(id, block)`` where ``block`` is
    the record's corpus-rarest name word (min document frequency,
    lexicographically-smallest word as tiebreak — fully deterministic).

    Plan: explode distinct words → df aggregation (|vocab|-bounded) →
    join back (AQE broadcasts a small vocab) → ``min(struct(df, w))``
    per record — one aggregation, no window.
    """
    words = (df.select(F.col(id_col),
                       F.explode(_words(text_col)).alias("w")))
    dfreq = words.groupBy("w").agg(F.count("*").alias("wdf"))
    pick = (words.join(dfreq, ["w"])
            .groupBy(id_col)
            .agg(F.min(F.struct(F.col("wdf"), F.col("w")))
                 .alias("__pick")))
    return pick.select(F.col(id_col), F.col("__pick.w").alias("block"))


def candidate_pairs(df: DataFrame, text_col: str, id_col: str,
                    max_dist: int = 3,
                    max_block: int = 1000) -> DataFrame:
    """Blocked fuzzy-match candidates: ``(id_a, id_b, dist)`` for every
    same-block record pair with ``levenshtein(name_a, name_b) <=
    max_dist`` and ``id_a < id_b``.

    Blocks larger than ``max_block`` are DROPPED (size guard against
    quadratic blow-up on stopword-like keys; at the default rarest-word
    blocking this only triggers on degenerate corpora).  The drop is a
    recall loss, never a precision loss — surface the dropped blocks to
    the caller via :func:`rarest_word_blocks` + a count if auditing.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    blocks = rarest_word_blocks(df, text_col, id_col)
    sized = blocks.join(
        blocks.groupBy("block").agg(F.count("*").alias("__bn")), ["block"])
    kept = (sized.where(F.col("__bn") <= max_block)
            .join(df.select(F.col(id_col), F.col(text_col)), [id_col]))
    a = kept.select(F.col("block"), F.col(id_col).alias("id_a"),
                    F.col(text_col).alias("__na"))
    b = kept.select(F.col("block"), F.col(id_col).alias("id_b"),
                    F.col(text_col).alias("__nb"))
    return (a.join(b, ["block"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.levenshtein("__na", "__nb").alias("dist"))
            .where(F.col("dist") <= max_dist))


def resolve_entities(df: DataFrame, text_col: str, id_col: str,
                     max_dist: int = 3,
                     max_block: int = 1000) -> DataFrame:
    """End-to-end entity resolution: block → pairwise-verify → cluster
    → canonicalize.  One row per input record with a non-null id:
    ``(id, cluster_id, canonical_id, n_members)`` where ``cluster_id``
    is the connected component of the :func:`candidate_pairs` match
    graph (component-min id), ``canonical_id`` is the cluster's
    survivor — longest name in characters, smallest id as tiebreak —
    and records with no surviving match are their own singleton
    cluster.  Ids must be unique per record (the usual ER contract).

    Recall follows ``candidate_pairs`` (single rarest-word blocking +
    ``max_block`` drop); precision follows ``max_dist``.  Transitive
    matches ARE merged (a~b, b~c puts a,c in one cluster even when
    ``dist(a,c) > max_dist``) — the standard ER closure semantics.

    Scale notes: clustering is ``dedup.connected_components``
    (collect-probe under 1M edges, pointer-jumping loop above); the
    canonical pick is ``min(struct(-len, id))`` — one map-side-combined
    aggregation, no window; the label/pick joins key on ``cluster_id``
    which is non-null by construction.
    """
    from .dedup import connected_components

    pairs = candidate_pairs(df, text_col, id_col, max_dist, max_block)
    comp = connected_components(pairs, "id_a", "id_b")
    base = (df.where(F.col(id_col).isNotNull())
            .select(F.col(id_col), F.col(text_col)))
    lab = (base.join(comp.withColumnRenamed("doc_id", id_col),
                     [id_col], "left")
           .select(F.col(id_col),
                   F.coalesce("cluster_id", F.col(id_col))
                   .alias("cluster_id"),
                   F.col(text_col)))
    pick = (lab.groupBy("cluster_id")
            .agg(F.count("*").alias("n_members"),
                 F.min(F.struct(
                     (-F.length(F.coalesce(F.col(text_col), F.lit(""))))
                     .alias("negl"),
                     F.col(id_col).alias("id"))).alias("__c")))
    return (lab.join(pick, ["cluster_id"])
            .select(F.col(id_col), "cluster_id",
                    F.col("__c.id").alias("canonical_id"), "n_members"))


def survivorship_merge(df: DataFrame, cluster_col: str, ts_col: str,
                       fields) -> DataFrame:
    """Field-level golden-record assembly (MDM survivorship): one row
    per ``cluster_col`` value carrying, for each field, the value of
    the LATEST row where that field is non-null — so a cluster's
    golden record can combine field values from different member
    records (the point of field-level over record-level
    survivorship).  Ties on ``ts_col`` break by the field value
    (max), making the pick deterministic; fields null in every member
    stay null; ``n_members`` counts the cluster's rows.

    Pair with :func:`resolve_entities`: its ``cluster_id`` is this
    operator's ``cluster_col``.

    Scale notes: ONE map-side-combined aggregation — per field a
    ``max(struct(ts, value))`` over structs built only when the field
    is non-null (aggregates skip null structs, which is exactly the
    "latest NON-NULL" semantics; the same null-conditional-struct
    idiom works verbatim in SQL engines for the oracle).  No windows,
    no joins, no second shuffle; skewed clusters reduce in the
    combiner.
    """
    from ..functions.util import as_list

    fields = as_list(fields)
    if not fields:
        raise ValueError("fields must be non-empty")
    aggs = [F.count("*").alias("n_members")]
    for f in fields:
        pick = F.max(F.when(F.col(f).isNotNull(),
                            F.struct(F.col(ts_col).alias("ts"),
                                     F.col(f).alias("v"))))
        aggs.append(pick.getField("v").alias(f))
    return df.groupBy(cluster_col).agg(*aggs)


def fs_weights(pairs: DataFrame, agree_cols, label_col: str = "is_match",
               smooth: float = 0.5) -> DataFrame:
    """Fellegi–Sunter match/unmatch weights from labeled candidate pairs —
    the classic probabilistic record-linkage scorer fitted as ONE tiny
    aggregation.

    Per comparison field ``f``: ``m = P(agree_f | match)`` and
    ``u = P(agree_f | non-match)`` with add-``smooth`` Laplace smoothing,
    and the log-weights ``w_agree = ln(m/u)``, ``w_disagree =
    ln((1−m)/(1−u))`` a scorer adds up per field. Null agreement values
    count as disagreement (conservative).

    Output: one row per field — ``(field, n_match, n_unmatch,
    agree_match, agree_unmatch, m, u, w_agree, w_disagree)``.

    Scale shape: one map-side-combined aggregation over the pairs
    relation to a |fields|-sized result; counts are exact int64, every
    probability/weight is a fixed-order scalar expression of those exact
    counts (engine-portable). At 10^12 candidate pairs this is a single
    scan.
    """
    from ..functions.util import as_list

    agree_cols = as_list(agree_cols)
    lab = F.col(label_col).cast("boolean")
    aggs = [F.sum(F.when(lab, 1).otherwise(0)).alias("_nm"),
            F.sum(F.when(~lab, 1).otherwise(0)).alias("_nu")]
    for c in agree_cols:
        a = F.coalesce(F.col(c).cast("boolean"), F.lit(False))
        aggs.append(F.sum(F.when(lab & a, 1).otherwise(0)).alias(f"_am_{c}"))
        aggs.append(F.sum(F.when(~lab & a, 1).otherwise(0))
                    .alias(f"_au_{c}"))
    g = pairs.agg(*aggs)
    s = float(smooth)
    per_field = []
    for c in agree_cols:
        nm = F.col("_nm").cast("double")
        nu = F.col("_nu").cast("double")
        am = F.col(f"_am_{c}").cast("double")
        au = F.col(f"_au_{c}").cast("double")
        m = (am + F.lit(s)) / (nm + F.lit(2 * s))
        u = (au + F.lit(s)) / (nu + F.lit(2 * s))
        per_field.append(F.struct(
            F.lit(c).alias("field"),
            F.col("_nm").alias("n_match"),
            F.col("_nu").alias("n_unmatch"),
            F.col(f"_am_{c}").alias("agree_match"),
            F.col(f"_au_{c}").alias("agree_unmatch"),
            m.alias("m"), u.alias("u"),
            F.log(m / u).alias("w_agree"),
            F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)).alias("w_disagree")))
    return (g.select(F.explode(F.array(*per_field)).alias("r"))
            .select("r.*"))
