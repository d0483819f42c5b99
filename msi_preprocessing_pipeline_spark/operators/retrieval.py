"""Retrieval evaluation: exact-integer IR metrics (hits / precision /
recall / MRR / AP / nDCG @k) and MMR diversified re-ranking.

The engine's similarity-search stack (``similarity.cosine_topk`` /
``lsh_topk`` / ``ivf_topk`` / ``pq_adc_topk``) produces ranked runs; this
module closes the loop with the standard trec_eval-style quality readout
over a relevance-judgment (qrels) table, plus the classic diversity
re-ranker used to de-duplicate retrieved context windows before they are
packed into a training sequence.

Determinism discipline (the ``operators.embeddings`` contract): every
metric is either exact integer arithmetic or a SINGLE IEEE division of
two exact integers — no distributed float sums anywhere — so Spark,
DuckDB and numpy agree bit-for-bit at any partitioning:

* nDCG discounts ``1/log2(r+1)`` are pre-scaled integer LITERALS
  (``floor(10^12/log2(r+1) + 0.5)``, one shared table embedded in both
  engines), so DCG/IDCG are exact int64 dot products, and nDCG is one
  division.
* AP@k multiplies each reciprocal rank by ``lcm(1..k)`` so the AP
  numerator is an exact integer; AP is one division.
* RR@k is ``1/first_relevant_rank`` — one division of ints.

Scale shape (run = |queries|·k rows — tiny; qrels — potentially
10^12 rows): qrels are touched by ONE map-side-combined aggregation to
the per-(query, grade) histogram; IDCG@k is computed FROM the histogram
(contiguous equal-grade rank spans × a prefix-discount literal table)
instead of sorting each query's judgments — no per-query top-k window
over qrels, no skew from hot queries. The hit join broadcasts the run.

Reference parity: the reference validates its pipeline output against
golden rankings by exact comparison (test/components/spectrum); this is
the distributed generalization to graded-relevance metrics.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale for the discount table: disc_u(r) = floor(10^12 /
#: log2(r+1) + 0.5).  Python's math.log2 is correctly-rounded on every
#: platform this engine targets (IEEE double), and the table is embedded
#: as literals in BOTH engines, so the contract cannot drift.
DISC_SCALE = 12


def ndcg_discount_units(k: int) -> list[int]:
    """``[disc_u(1), …, disc_u(k)]`` — the shared Spark/SQL literal table."""
    return [int(math.floor(10 ** DISC_SCALE / math.log2(r + 1) + 0.5))
            for r in range(1, k + 1)]


def _prefix(units: list[int]) -> list[int]:
    """``P[i] = Σ_{r<=i} disc_u(r)`` with ``P[0] = 0`` (len k+1)."""
    out = [0]
    for u in units:
        out.append(out[-1] + u)
    return out


def retrieval_metrics(run: DataFrame, qrels: DataFrame, k: int = 10,
                      query_col: str = "query_id", doc_col: str = "doc_id",
                      rank_col: str = "rank", rel_col: str = "rel",
                      max_grade: int = 15) -> DataFrame:
    """Per-query IR metrics at cutoff ``k`` for a ranked ``run``
    (one row per (query, doc) with a 1-based, per-query-unique ``rank``)
    against graded judgments ``qrels`` (rows with ``rel >= 1`` are
    relevant; ``rel`` is capped by ``max_grade`` — raise, don't clip).

    Output: one row per run query —
    ``(query_id, n_ret, n_rel, hits, precision_at_k, recall_at_k,
    rr_at_k, ap_at_k, dcg_u, idcg_u, ndcg_at_k)`` where ``dcg_u`` /
    ``idcg_u`` are the exact integer DCG/IDCG in ``10^-12`` discount
    units with gain ``2^rel - 1``, and every ratio metric is a single
    IEEE division (null when its denominator is 0: no judged-relevant
    docs → recall/ap/ndcg null; no relevant retrieved → rr null).

    IDCG without sorting qrels: grades of equal value occupy a
    CONTIGUOUS span of ideal ranks, so the ideal top-k gain is
    ``Σ_grades gain(g) · (P[min(prior+cnt, k)] - P[min(prior, k)])``
    over the per-(query, grade) count histogram, with ``prior`` the
    count of strictly-higher grades and ``P`` the literal prefix-sum
    discount table — identical to the sorted definition because
    within-grade order cannot change the sum.

    Overflow: ``k · (2^max_grade - 1) · 10^12 < 2^63`` is validated at
    call time; AP's ``lcm(1..k)`` scaling requires ``k <= 40``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > 40:
        raise ValueError(f"k must be <= 40 for exact AP (lcm growth), got {k}")
    if k * ((1 << max_grade) - 1) * 10 ** DISC_SCALE >= 1 << 63:
        raise ValueError("k * (2^max_grade - 1) * 10^12 overflows int64")
    units = ndcg_discount_units(k)
    prefix = _prefix(units)
    lcm = math.lcm(*range(1, k + 1))
    disc_arr = F.array(*[F.lit(u) for u in units])            # 1-based @rank
    pref_arr = F.array(*[F.lit(p) for p in prefix])           # P[i] at i+1
    recip_arr = F.array(*[F.lit(lcm // r) for r in range(1, k + 1)])

    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    runk = run.where(r <= k).select(q.alias("__q"), d.alias("__d"),
                                    r.cast("int").alias("__r"))
    rel = qrels.where(F.col(rel_col) >= 1).select(
        q.alias("__q"), d.alias("__d"),
        F.col(rel_col).cast("int").alias("__g"))

    # --- ONE pass over qrels: per-(query, grade) histogram -> n_rel + IDCG
    grades = rel.groupBy("__q", "__g").agg(F.count("*").alias("__c"))
    wg = (Window.partitionBy("__q").orderBy(F.col("__g").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    # gain 2^rel - 1 as exact integer; shiftleft's python wrapper only
    # takes a literal shift, so the column-shift goes through expr()
    gain = F.expr("shiftleft(1, __g)") - 1
    prior = F.coalesce(F.sum("__c").over(wg), F.lit(0))
    lo = F.least(prior, F.lit(k)).cast("int")
    hi = F.least(prior + F.col("__c"), F.lit(k)).cast("int")
    span = (F.element_at(pref_arr, hi + 1) - F.element_at(pref_arr, lo + 1))
    ideal = (grades
             .withColumn("__contrib", gain.cast("long") * span)
             .groupBy("__q")
             .agg(F.sum(F.col("__c")).alias("n_rel"),
                  F.sum("__contrib").alias("idcg_u")))

    # --- hits: judged-relevant retrieved rows (broadcast the tiny run)
    hits = rel.join(F.broadcast(runk), ["__q", "__d"])
    wh = (Window.partitionBy("__q").orderBy("__r")
          .rowsBetween(Window.unboundedPreceding, 0))
    per_hit = hits.withColumn("__cumhits", F.count("*").over(wh))
    hit_agg = per_hit.groupBy("__q").agg(
        F.count("*").alias("hits"),
        F.sum((F.expr("shiftleft(1, __g)") - 1).cast("long")
              * F.element_at(disc_arr, F.col("__r"))).alias("dcg_u"),
        F.min("__r").alias("__first"),
        F.sum(F.col("__cumhits")
              * F.element_at(recip_arr, F.col("__r"))).alias("__ap_num"))

    base = runk.groupBy(F.col("__q").alias(query_col)).agg(
        F.count("*").alias("n_ret"))
    out = (base
           .join(ideal.withColumnRenamed("__q", query_col), query_col, "left")
           .join(hit_agg.withColumnRenamed("__q", query_col), query_col,
                 "left"))
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    hits_c = F.coalesce(F.col("hits"), F.lit(0)).cast("long")
    idcg = F.coalesce(F.col("idcg_u"), F.lit(0)).cast("long")
    dcg = F.coalesce(F.col("dcg_u"), F.lit(0)).cast("long")
    denom_ap = F.least(n_rel, F.lit(k))
    return out.select(
        query_col,
        F.col("n_ret").cast("long").alias("n_ret"),
        n_rel.alias("n_rel"), hits_c.alias("hits"),
        (hits_c.cast("double") / F.lit(float(k))).alias("precision_at_k"),
        F.when(n_rel > 0, hits_c.cast("double") / n_rel)
        .alias("recall_at_k"),
        F.when(F.col("__first").isNotNull(),
               F.lit(1.0) / F.col("__first")).alias("rr_at_k"),
        F.when(denom_ap > 0,
               F.coalesce(F.col("__ap_num"), F.lit(0)).cast("double")
               / (denom_ap * F.lit(lcm)).cast("double")).alias("ap_at_k"),
        dcg.alias("dcg_u"), idcg.alias("idcg_u"),
        F.when(idcg > 0, dcg.cast("double") / idcg.cast("double"))
        .alias("ndcg_at_k"))


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 10,
               pool: int = 50, lam_pct: int = 70, id_col: str = "vec_id",
               vec_col: str = "embedding", query_id_col: str = "query_id",
               scale: int = 6) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98)
    diversified top-k: greedily pick the candidate maximizing
    ``λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)`` — the standard way to
    de-duplicate retrieved context before packing it into a training
    window, so k near-identical passages don't crowd out coverage.

    Exactness: ``λ`` is the integer percentage ``lam_pct`` and both
    ``rel`` and ``sim`` are the engine's exact-int cosine key
    ``floor(dot/√(n2a·n2b)·10⁹ + 0.5)`` over micro-quantized vectors
    (the ``similarity.hard_negatives`` contract), so the greedy score
    ``lam_pct·rel_q − (100−lam_pct)·maxsim_q`` is an exact int64 and
    selection (score desc, id asc) is bit-reproducible at any
    partitioning / engine — what lets an iterative re-ranker be
    golden-pinned.  The empty-selection diversity term is 0 (the
    classical convention), so round 1 is pure relevance order.

    Scale shape: candidate POOLING is the broadcast-scored top-``pool``
    window (ids + scores only — vectors do NOT ride the ranking
    shuffle; pass a pre-bucketed candidate relation via ``queries``
    upstream ANN ops for 10^9+ corpora), vectors are re-fetched for the
    |queries|·pool winners with broadcast joins, and the greedy loop
    runs ONE bounded Arrow batch per query (``applyInPandas``, ≤pool
    rows — never the corpus).  Zero-norm vectors are excluded from both
    sides (cosine undefined).
    """
    import numpy as np
    import pandas as pd

    if not 0 <= lam_pct <= 100:
        raise ValueError(f"lam_pct must be in [0, 100], got {lam_pct}")
    if pool < k:
        raise ValueError(f"pool ({pool}) must be >= k ({k})")
    from .similarity import _quantize_vecs

    n2_of = (lambda c: F.aggregate(F.transform(c, lambda x: x * x),
                                   F.lit(0).cast("long"), lambda a, x: a + x))
    base = (corpus.select(F.col(id_col),
                          _quantize_vecs(corpus, vec_col, scale)
                          .alias("__q"))
            .withColumn("__n2", n2_of(F.col("__q")))
            .where(F.col("__n2") > 0))
    qs = (queries.select(F.col(id_col).alias(query_id_col),
                         _quantize_vecs(queries, vec_col, scale)
                         .alias("__qq"))
          .withColumn("__qn2", n2_of(F.col("__qq")))
          .where(F.col("__qn2") > 0)
          .select(query_id_col, "__qq", "__qn2"))

    # --- pool: exact-int relevance key, ids-only through the shuffle
    dot = F.aggregate(
        F.zip_with(F.col("__q"), F.col("__qq"), lambda x, y: x * y),
        F.lit(0).cast("long"), lambda a, x: a + x)
    rel_q = F.floor(dot.cast("double")
                    / (F.sqrt(F.col("__n2").cast("double"))
                       * F.sqrt(F.col("__qn2").cast("double")))
                    * F.lit(1e9) + F.lit(0.5)).cast("long")
    scored = (base.crossJoin(F.broadcast(
        qs.select(query_id_col, "__qq", "__qn2")))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, F.col(id_col).alias("doc_id"),
                rel_q.alias("rel_q")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rel_q").desc(), F.col("doc_id").asc())
    pooled = (scored.withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= pool).drop("__rk"))

    # --- re-fetch vectors for the winners (|queries|·pool rows)
    cand = (base.select(F.col(id_col).alias("doc_id"),
                        F.col("__q").alias("__dv"))
            .join(F.broadcast(pooled), "doc_id"))

    id_t = dict(corpus.dtypes)[id_col]
    out_schema = (f"{query_id_col} {id_t}, doc_id {id_t}, mmr_round int, "
                  f"rel_q long, score_u long")
    lam, mu = int(lam_pct), 100 - int(lam_pct)
    kk = int(k)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        D = np.array(pdf["__dv"].tolist(), dtype=np.int64)
        rel = pdf["rel_q"].to_numpy(np.int64)
        n = len(pdf)
        G = D @ D.T                                   # exact int64 grams
        nrm = np.sqrt(np.diag(G).astype(np.float64))
        sim = np.floor(G / (nrm[:, None] * nrm[None, :]) * 1e9 + 0.5) \
            .astype(np.int64)
        avail = np.ones(n, dtype=bool)
        maxsim = np.zeros(n, dtype=np.int64)
        picks, scores = [], []
        for _ in range(min(kk, n)):
            score = lam * rel - mu * maxsim
            score[~avail] = np.iinfo(np.int64).min
            best = int(np.flatnonzero(score == score.max())[0])
            picks.append(best)
            scores.append(int(score[best]))
            avail[best] = False
            maxsim = np.maximum(maxsim, sim[:, best])
        return pd.DataFrame({
            query_id_col: pdf[query_id_col].iloc[picks].to_numpy(),
            "doc_id": pdf["doc_id"].iloc[picks].to_numpy(),
            "mmr_round": np.arange(1, len(picks) + 1, dtype=np.int32),
            "rel_q": rel[picks], "score_u": np.array(scores, np.int64)})

    return cand.groupBy(query_id_col).applyInPandas(_greedy, out_schema)


def retrieval_metrics_sql(run_cte: str, qrels_cte: str, k: int = 10) -> str:
    """DuckDB mirror of :func:`retrieval_metrics` over two CTE names
    (``run_cte``: (query_id, doc_id, rank); ``qrels_cte``: (query_id,
    doc_id, rel) — both already cutoff-agnostic).  Shares the SAME
    discount / reciprocal literal tables, so the integers are identical;
    the oracle computes IDCG by the naive per-query sort, cross-checking
    the histogram-span derivation used on the Spark side.
    """
    units = ndcg_discount_units(k)
    lcm = math.lcm(*range(1, k + 1))
    disc_list = "[" + ", ".join(str(u) for u in units) + "]"
    recip_list = "[" + ", ".join(str(lcm // r) for r in range(1, k + 1)) + "]"
    return f"""
        runk as (select query_id, doc_id, rank from {run_cte}
                 where rank <= {k}),
        rel as (select query_id, doc_id, rel from {qrels_cte}
                where rel >= 1),
        ideal as (
            select query_id, cast(count(*) as bigint) as n_rel,
                   cast(sum(case when irank <= {k}
                            then ((1 << rel) - 1)
                                 * list_extract({disc_list}, irank)
                            else 0 end) as bigint) as idcg_u
            from (select query_id, rel,
                         cast(row_number() over (partition by query_id
                              order by rel desc, doc_id) as int) as irank
                  from rel) g
            group by 1
        ),
        hit as (
            select r.query_id, r.rank, q.rel,
                   cast(count(*) over (partition by r.query_id
                        order by r.rank) as bigint) as cumhits
            from runk r join rel q using (query_id, doc_id)
        ),
        hagg as (
            select query_id, cast(count(*) as bigint) as hits,
                   cast(sum(((1 << rel) - 1)
                        * list_extract({disc_list}, cast(rank as int)))
                        as bigint) as dcg_u,
                   min(rank) as first_rank,
                   cast(sum(cumhits * list_extract({recip_list},
                            cast(rank as int))) as bigint) as ap_num
            from hit group by 1
        ),
        base as (select query_id, cast(count(*) as bigint) as n_ret
                 from runk group by 1)
        select b.query_id, b.n_ret,
               cast(coalesce(i.n_rel, 0) as bigint) as n_rel,
               cast(coalesce(h.hits, 0) as bigint) as hits,
               cast(coalesce(h.hits, 0) as double) / {float(k)}
                   as precision_at_k,
               case when coalesce(i.n_rel, 0) > 0 then
                   cast(coalesce(h.hits, 0) as double) / i.n_rel
               end as recall_at_k,
               case when h.first_rank is not null then
                   1.0 / h.first_rank end as rr_at_k,
               case when least(coalesce(i.n_rel, 0), {k}) > 0 then
                   cast(coalesce(h.ap_num, 0) as double)
                   / cast(least(i.n_rel, {k}) * {lcm} as double)
               end as ap_at_k,
               cast(coalesce(h.dcg_u, 0) as bigint) as dcg_u,
               cast(coalesce(i.idcg_u, 0) as bigint) as idcg_u,
               case when coalesce(i.idcg_u, 0) > 0 then
                   cast(coalesce(h.dcg_u, 0) as double)
                   / cast(i.idcg_u as double) end as ndcg_at_k
        from base b
        left join ideal i using (query_id)
        left join hagg h using (query_id)
    """


def rrf_fuse(runs: DataFrame, k: int = 60,
             query_col: str = "query_id", doc_col: str = "doc_id",
             rank_col: str = "rank", top_n: int | None = None
             ) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner (lexical + vector runs):
    ``score(q, d) = Σ_systems 1 / (k + rank_s(q, d))`` over every run
    row, re-ranked per query.

    ``runs`` is the union of per-system rankings: one row per
    (query, doc, system) with that system's 1-based ``rank_col`` — the
    system identity itself is irrelevant to the formula, so no system
    column is required and the SAME pair appearing in multiple runs
    simply contributes multiple terms.

    Determinism: ``1/(k + rank)`` is ONE IEEE division, micro-quantized
    to 1e-12 int64 units and summed as exact integers (the
    ``average_precision`` idiom — raw double sums are partition-order-
    sensitive); the fused order breaks score ties by doc id asc.  Null
    ranks are dropped (a system that did not rank the doc contributes
    nothing — exactly RRF's semantics).

    Scale shape: ONE map-side-combined (query, doc) aggregation + a
    per-query rank window (with ``top_n``, state is the window's row
    counter; the heavy lifting stays in the partial aggregation).
    """
    from pyspark.sql import Window

    from ..functions.util import DEC38, quantize

    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    term = quantize(F.lit(1.0)
                    / (F.lit(float(k)) + F.col(rank_col).cast("double")),
                    12)
    fused = (runs.where(F.col(rank_col).isNotNull())
             .groupBy(query_col, doc_col)
             .agg(F.sum(term.cast(DEC38)).cast("long")
                  .alias("rrf_score_u"),
                  F.count("*").cast("long").alias("n_systems")))
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score_u").desc(), F.col(doc_col).asc())
    out = fused.withColumn("fused_rank",
                           F.row_number().over(w).cast("long"))
    if top_n is not None:
        out = out.where(F.col("fused_rank") <= top_n)
    return out
