"""Bloom-filter runtime join pruning (semi/anti join pre-filter).

The scale problem: ``probe LEFT SEMI JOIN build`` shuffles the ENTIRE
probe side on the join key even when only a few percent of probe rows
survive.  At 10^12 probe rows that shuffle — not the join itself — is the
bottleneck.  Spark's own optimizer injects a runtime bloom filter for
exactly this shape (``spark.sql.optimizer.runtime.bloomFilter.enabled``,
JVM ``BloomFilterAggregate``), but only when its size/selectivity
heuristics fire and never for anti-joins.  This operator is the portable,
explicit version:

1. BUILD — hash every build-side key ``k`` ways with ``xxhash64(key,
   seed_i) mod n_bits`` (JVM expression, whole-stage codegen), explode to
   bit positions, ``distinct`` (map-side combined: at most ``k·n``
   position rows cross the wire, no raw keys), pack into 64-bit words
   with ``bit_or(shiftleft(1L, pos % 64))`` and collect the ≤
   ``n_bits/64``-row sparse word relation to the driver.  The collect is
   bounded by the bitmap size — ``max_bits`` fail-fasts before any
   unbounded driver transfer (the quantiles.COLLECT_THRESHOLD pattern).
2. PROBE — one map-only pass: positions via the SAME JVM ``xxhash64``
   expressions, then a vectorized Arrow batch test of all ``k`` bits
   against the ``sc.broadcast``-shipped packed ``uint64`` bitmap.  No
   shuffle, no per-row Python; at cluster scale the filter runs BEFORE
   the probe-side Exchange, cutting shuffled bytes by ≈ the filter's
   selectivity (bloom guarantees NO false negatives, so nothing needed
   downstream is lost).
3. VERIFY — false positives (rate ``fpp``) are removed by the exact
   equi-join, which now runs over the pruned probe side only.  For
   ``how='anti'`` the composition inverts: bloom-NEGATIVE rows are
   definitely non-members and bypass the join entirely; only the
   bloom-positive sliver needs the exact ``left_anti``.

Result is row-identical to the plain semi/anti join at any ``fpp`` —
``fpp`` trades bitmap size against how much of the probe side the exact
join still sees.

Reference parity note: the reference pipeline has no joins at all (Luigi
stages pass whole matrices, e.g. ``pipeline/_base.py:70-90`` reloads full
datasets); this operator exists for the 10^12-row recast where artifact ⋈
corpus joins (SURVEY.md §2 J1-J6) need probe-side pruning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.arrowutil import list_col_matrix

_POS = "__bloom_pos"
_KEY = "__bloom_key"
_MAYBE = "__bloom_maybe"


def _position_exprs(key_col, k: int, n_bits: int, seed: int):
    """``k`` independent probe positions as JVM expressions. ``pmod``
    folds xxhash64's signed range into [0, n_bits)."""
    return [F.pmod(F.xxhash64(key_col, F.lit(int(seed) + i)),
                   F.lit(int(n_bits)))
            for i in range(k)]


def bloom_params(n_keys: int, fpp: float) -> "tuple[int, int]":
    """Textbook sizing: ``m = -n·ln p / ln²2`` bits (rounded up to a
    64-bit word), ``k = (m/n)·ln 2`` probes."""
    n = max(1, int(n_keys))
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0,1), got {fpp}")
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, int(round(m / n * math.log(2.0))))
    return m, k


@dataclass
class BloomFilter:
    """Driver-side packed bloom bitmap + the hashing contract needed to
    reproduce its probe positions in any Spark plan."""

    n_bits: int
    k: int
    seed: int
    words: np.ndarray  # uint64[n_bits // 64]
    n_keys: int        # build-side distinct-key count the sizing used
    _bc_cache: dict = None  # {sc applicationId+id: Broadcast} — see below

    def _broadcast(self, spark):
        """One ``sc.broadcast`` per SparkContext per filter, cached —
        a fresh broadcast per probe would leak a bitmap-sized copy on
        driver and executors for every reuse of a prebuilt filter."""
        sc = spark.sparkContext
        key = (sc.applicationId, id(sc))
        if self._bc_cache is None:
            object.__setattr__(self, "_bc_cache", {})
        if key not in self._bc_cache:
            self._bc_cache[key] = sc.broadcast(self.words)
        return self._bc_cache[key]

    def might_contain(self, df: DataFrame, key: str,
                      out_col: str = _MAYBE) -> DataFrame:
        """Append boolean ``out_col``: False ⇒ key is DEFINITELY not in
        the build set; True ⇒ probably is (false-positive rate ``fpp``).
        One map-only Arrow pass; the bitmap ships once per executor via
        a cached ``sc.broadcast``."""
        spark = df.sparkSession
        bc = self._broadcast(spark)
        k, n_bits = self.k, self.n_bits
        with_pos = df.withColumn(
            _POS, F.array(*_position_exprs(F.col(key), k, n_bits,
                                           self.seed)))
        # fresh StructType — DataFrame.schema is cached on the DataFrame
        # and StructType.add mutates in place, so .add on df.schema would
        # poison a second might_contain over the same DataFrame
        out_schema = T.StructType(
            list(df.schema.fields)
            + [T.StructField(out_col, T.BooleanType(), False)])

        def test(batches):
            words = bc.value
            for batch in batches:
                pm = list_col_matrix(batch, _POS, np.int64)
                if pm.size:
                    pm = pm.astype(np.uint64)
                    w = words[(pm >> np.uint64(6)).astype(np.int64)]
                    bits = (w >> (pm & np.uint64(63))) & np.uint64(1)
                    ok = bits.astype(bool).all(axis=1)
                else:
                    ok = np.zeros(len(batch), dtype=bool)
                keep = [batch.column(i) for i, f in enumerate(batch.schema)
                        if f.name != _POS]
                names = [f.name for f in batch.schema if f.name != _POS]
                yield pa.RecordBatch.from_arrays(
                    keep + [pa.array(ok, type=pa.bool_())],
                    names=names + [out_col])

        return with_pos.mapInArrow(test, out_schema)


def bloom_build(keys: DataFrame, key: str, fpp: float = 0.002,
                expected_n: "int | None" = None, seed: int = 42,
                max_bits: int = 1 << 28) -> BloomFilter:
    """Build a :class:`BloomFilter` over ``keys[key]`` (rows need not be
    distinct; nulls are ignored — an equi-join can never match them).

    Distributed shape: explode → position-``distinct`` (map-side
    combined; raw keys never shuffle) → per-word ``bit_or`` → a collect
    bounded by ``n_bits/64`` rows.  ``expected_n`` skips the sizing
    count-job when the caller already knows the cardinality.
    """
    kk = keys.select(F.col(key).alias(_KEY)).where(F.col(_KEY).isNotNull())
    n = int(expected_n) if expected_n is not None \
        else kk.select(_KEY).distinct().count()
    n_bits, k = bloom_params(n, fpp)
    if n_bits > max_bits:
        raise ValueError(
            f"bloom_build: {n} keys at fpp={fpp} need {n_bits} bits > "
            f"max_bits={max_bits}; raise fpp or max_bits (bitmap memory "
            f"is n_bits/8 bytes on the driver and every executor).")
    words_rows = (
        kk.select(F.explode(F.array(*_position_exprs(
            F.col(_KEY), k, n_bits, seed))).alias("__p"))
        .distinct()
        .select(F.shiftright(F.col("__p"), 6).alias("__w"),
                F.expr("shiftleft(1L, cast(pmod(__p, 64) as int))")
                .alias("__bit"))
        .groupBy("__w").agg(F.bit_or("__bit").alias("__word"))
        .collect())
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words_rows:
        words[r["__w"]] = np.uint64(r["__word"] & 0xFFFFFFFFFFFFFFFF)
    return BloomFilter(n_bits=n_bits, k=k, seed=seed, words=words,
                       n_keys=n)


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_key: str,
                    build_key: str, how: str = "semi", fpp: float = 0.002,
                    expected_n: "int | None" = None, seed: int = 42,
                    bloom: "BloomFilter | None" = None) -> DataFrame:
    """Row-identical to ``probe.join(build_keys, probe_key == build_key,
    'left_semi'/'left_anti')`` with the probe side bloom-pruned before it
    reaches the join's Exchange.

    ``semi``: bloom-positive rows → exact left-semi (false positives die
    there).  ``anti``: bloom-negative rows pass straight through (no
    false negatives ⇒ definitely unmatched); only bloom-positives take
    the exact left-anti.  Pass a prebuilt ``bloom`` to amortize one build
    across many probes (the persistable-artifact shape).
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be semi|anti, got {how}")
    probe_type = probe.schema[probe_key].dataType
    build_type = build.schema[build_key].dataType
    if probe_type != build_type:
        # a silent cast would wrap/narrow wide build keys (e.g. long →
        # int) and break the row-identical-to-plain-join guarantee; and
        # xxhash64 is type-sensitive, so the two sides MUST hash the
        # same type — make the caller align them explicitly
        raise ValueError(
            f"bloom_semi_join: key types differ — probe {probe_key}:"
            f"{probe_type.simpleString()} vs build {build_key}:"
            f"{build_type.simpleString()}; cast them to a common type "
            f"before joining (a widening cast on the narrower side is "
            f"always safe)")
    keys = (build.select(F.col(build_key).alias(_KEY))
            .where(F.col(_KEY).isNotNull()).distinct())
    if bloom is None:
        # the distinct-key relation feeds THREE jobs (sizing count,
        # bitmap build, exact verify join): materialize it once so the
        # build side is scanned+deduped once, not three times
        keys = keys.localCheckpoint()
    bf = bloom if bloom is not None else bloom_build(
        keys, _KEY, fpp=fpp, expected_n=expected_n, seed=seed)
    flagged = bf.might_contain(probe, probe_key, _MAYBE)
    cond = F.col(probe_key) == F.col(_KEY)
    positives = flagged.where(F.col(_MAYBE)).drop(_MAYBE)
    if how == "semi":
        return positives.join(keys, cond, "left_semi")
    negatives = flagged.where(~F.col(_MAYBE)).drop(_MAYBE)
    return negatives.unionByName(positives.join(keys, cond, "left_anti"))
