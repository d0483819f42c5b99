"""Clustered layout writer: the three physical properties read back from
the files themselves."""

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from msi_preprocessing_pipeline_spark.sources.layout import write_clustered


def test_write_clustered_properties(spark, tmp_path):
    path = str(tmp_path / "clustered")
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("etype", F.col("event_type")))
    write_clustered(ev, path, partition_by="etype",
                    range_by=["user_id"], sort_by=["user_id", "ts"],
                    n_files=4)

    # 1. hive partition dirs exist -> pruning applies
    dirs = sorted(os.path.basename(d)
                  for d in glob.glob(f"{path}/etype=*"))
    assert len(dirs) == 5

    # within one partition dir:
    files = sorted(glob.glob(f"{path}/etype=click/*.parquet"))
    assert 1 < len(files) <= 4
    ranges = []
    for f in files:
        pdf = pd.read_parquet(f)
        # 2. rows inside each file sorted by (user_id, ts)
        key = list(zip(pdf["user_id"], pdf["ts"]))
        assert key == sorted(key)
        ranges.append((pdf["user_id"].min(), pdf["user_id"].max()))
    # 3. files own (essentially) disjoint user ranges — range partitioning
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # boundary key may touch, ranges never interleave

    # round-trip completeness
    back = spark.read.parquet(path)
    assert back.count() == ev.count()


def test_write_clustered_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "pruned")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    write_clustered(ev.withColumn("et", F.col("event_type")), path,
                    partition_by="et", range_by=["user_id"], n_files=2)
    q = spark.read.parquet(path).where(F.col("et") == "click")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # partition filters reach the scan (pruned read, not a full scan)
    assert "PartitionFilters: [isnotnull(et" in plan
