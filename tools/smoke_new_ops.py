"""Quick functional smoke of the round-4 LM/sequence/MI operators."""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from msi_preprocessing_pipeline_spark.session import build_session  # noqa: E402
from msi_preprocessing_pipeline_spark.operators.lm import (  # noqa: E402
    hash_tokenize, bigram_counts, unigram_counts, doc_bigrams, lm_score,
    pmi_bigrams, context_target_pairs, oov_rate)
from msi_preprocessing_pipeline_spark.operators.sequences import (  # noqa: E402
    transition_counts, recency_features, trailing_values)
from msi_preprocessing_pipeline_spark.operators.drift import mutual_info  # noqa: E402

spark = build_session("smoke-new-ops", parallelism=4, shuffle_partitions=8)
sf = "/root/testdata/sf0.001"
docs = spark.read.parquet(f"{sf}/documents.parquet")
ev = spark.read.parquet(f"{sf}/events.parquet")

tok = hash_tokenize(docs, vocab_size=4096, seed=7, keep_cols=("source",))
tok.cache()
print("tokenized:", tok.count(), tok.columns)
tok.show(3, truncate=60)

bc = bigram_counts(tok)
print("bigram types:", bc.count())
print("unigram types:", unigram_counts(tok).count())
print("doc_bigrams:", doc_bigrams(tok).count())

sc = lm_score(tok, k=0.5, vocab_size=4096)
sc.show(5)
print("lm rows:", sc.count(), "null nll:",
      sc.where(F.col("nll").isNull()).count())

pm = pmi_bigrams(tok, min_count=3)
print("pmi rows:", pm.count())
pm.orderBy(F.desc("pmi")).show(3)

cp = context_target_pairs(tok, context_len=4)
print("context pairs:", cp.count())
cp.show(3, truncate=40)

vocab = unigram_counts(tok).where(F.col("c") >= 5).select(F.col("t"))
ov = oov_rate(tok, vocab)
ov.show(3)
print("oov rows:", ov.count())

tc = transition_counts(ev, "user_id", "event_type", "ts",
                       tiebreak=["event_id"])
tc.orderBy("from_type", "to_type").show(30)

rf = recency_features(ev, ["user_id", "event_type"], "ts",
                      tiebreak=["event_id"])
rf.select("event_id", "user_id", "event_type", "secs_since_prev",
          "n_prior").show(5)
print("recency rows:", rf.count())

tv = trailing_values(ev, "value", "user_id", "ts", k=3,
                     tiebreak=["event_id"])
tv.select("event_id", "user_id", "value", "value_last3").show(5,
                                                              truncate=50)
print("trailing rows:", tv.count())

mi = mutual_info(docs, "lang", "source")
mi.show()
ev2 = ev.withColumn("hi_value", (F.col("value") > 100).cast("int"))
mutual_info(ev2, "event_type", "hi_value").show()
spark.stop()
print("SMOKE OK")
