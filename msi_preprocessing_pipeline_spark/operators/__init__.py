"""DataFrame-level operator library.

* :mod:`asof`       — as-of joins (union+window and sort-merge variants,
  skew salting), backfill.
* :mod:`windows`    — lag/lead/sessionize over (entity, ts).
* :mod:`quantiles`  — distributed EXACT quantiles (sort + rank + linear
  interpolation; never ``percentile_approx`` on the compat path).
* :mod:`spectrum`   — the staged spectrum feature operators (vectorized
  Arrow UDFs over broadcast artifacts).
* :mod:`dedup`      — exact/MinHash-LSH/SimHash/n-gram-Jaccard dedup,
  winnowing fingerprints, benchmark decontamination, hot-key guards.
* :mod:`similarity` — brute-force + LSH/IVF-bucketed cosine top-k.
* :mod:`text`       — language-ID, quality scoring, token counts,
  fingerprints, repetition (Gopher-style) metrics.
* :mod:`sampling`   — deterministic md5-band sampling and group-stable
  train/val/test splits (engine-portable, partition-invariant).
* :mod:`multimodal` — binary-payload plumbing (decode steps stubbed).
"""
