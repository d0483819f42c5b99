"""DataFrame-level operator library.

* :mod:`asof`       — as-of joins (union+window and sort-merge variants,
  skew salting), backfill.
* :mod:`windows`    — lag/lead/sessionize/rolling (row + event-time
  RANGE frames) over (entity, ts).
* :mod:`training`   — PIT training-set assembly: multi-feature as-of
  composition (shuffle/broadcast/merge strategies + fused one-shuffle
  variant) and trailing/leading interval aggregates at observation time
  (multi-horizon, multi-source, time-bucketed skew handling).
* :mod:`sketches`   — mergeable sketches: HLL distinct counting, Count-
  Min frequencies (bit-exact numpy decoder), KLL approximate quantiles,
  Theta distinct sets with union/intersection/difference algebra
  (per-slice sketch tables + union rollups).
* :mod:`quantiles`  — distributed EXACT quantiles (sort + rank + linear
  interpolation; never ``percentile_approx`` on the compat path).
* :mod:`spectrum`   — the staged spectrum feature operators (vectorized
  Arrow UDFs over broadcast artifacts).
* :mod:`dedup`      — exact/MinHash-LSH/SimHash/n-gram-Jaccard dedup,
  winnowing fingerprints, benchmark decontamination, hot-key guards,
  substring-level duplicate spans (words or token arrays) + passage
  cutting.
* :mod:`similarity` — brute-force + LSH/IVF-bucketed cosine top-k.
* :mod:`text`       — language-ID, quality scoring, token counts,
  fingerprints, repetition (Gopher-style) metrics.
* :mod:`sampling`   — deterministic md5-band sampling, group-stable
  train/val/test splits, stratified rates and target-mixture rebalance
  (engine-portable, partition-invariant).
* :mod:`bpe`        — BPE tokenizer: distributed word histogram ->
  driver merge-loop fit (bounded vocab) -> Arrow-batched encode.
* :mod:`changelog`  — CDC apply: fold keyed upserts/deletes into a
  snapshot with one union + one window (no join).
* :mod:`validate`   — declarative data-quality expectations fused into
  one aggregation scan (null / unique / range / regex / set rules).
* :mod:`multimodal` — binary-payload plumbing (decode steps stubbed).
* :mod:`encoding`   — hashing-trick buckets, robust (median/IQR)
  standardization, equal-frequency quantile binning.
* :mod:`drift`      — PSI feature-drift monitoring between snapshots
  (fixed bins, Laplace-smoothed; shares its bin expression with the
  streaming monitor).
"""
