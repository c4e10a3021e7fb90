"""The ``etl_versioned`` Python Data Source: batch round-trip, version
pinning, row-group partition parallelism, filter pushdown, atomic
commit, and the versions-as-micro-batches stream reader."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_template_spark.datasource import (
    FORMAT_NAME,
    VersionedDataSource,
    register_versioned_source,
)
from etl_template_spark.io import latest_version, list_versions, write_versioned


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_versioned_source(spark)


def _seed(spark, root, step="seed", n=100):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 2.5).alias("x")
    )
    df.write.format(FORMAT_NAME).option("step", step).mode("append").save(root)
    return df


def test_write_then_read_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    df = _seed(spark, root)
    back = (
        spark.read.format(FORMAT_NAME).option("step", "seed").load(root)
    )
    assert sorted(back.columns) == sorted(df.columns)
    assert sorted(r.id for r in back.collect()) == list(range(100))


def test_every_write_creates_next_immutable_version(spark, tmp_path):
    root = str(tmp_path)
    _seed(spark, root, n=10)
    _seed(spark, root, n=20)
    assert list_versions(root, "seed") == [1, 2]
    v0 = (
        spark.read.format(FORMAT_NAME)
        .option("step", "seed").option("version", "1").load(root)
    )
    v1 = (
        spark.read.format(FORMAT_NAME)
        .option("step", "seed").option("version", "2").load(root)
    )
    assert (v0.count(), v1.count()) == (10, 20)
    # unpinned read resolves latest
    assert (
        spark.read.format(FORMAT_NAME).option("step", "seed").load(root).count() == 20
    )


def test_interop_with_jvm_versioned_writer(spark, sf_dir, tmp_path):
    """A version committed by the JVM parquet path (write_versioned) is
    readable through the connector and vice versa — same layout."""
    root = str(tmp_path)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(50)
    write_versioned(orders, root, "orders_step")
    back = (
        spark.read.format(FORMAT_NAME).option("step", "orders_step").load(root)
    )
    assert back.count() == 50
    # connector-committed version readable by plain parquet scan
    _seed(spark, root, step="py_step", n=5)
    v = latest_version(root, "py_step")
    assert spark.read.parquet(os.path.join(root, "py_step", f"v={v}")).count() == 5


def test_row_group_partitions_parallelize(spark, tmp_path):
    root = str(tmp_path)
    # 8 shuffle partitions → several task files → several input partitions
    spark.range(1000).repartition(8).write.format(FORMAT_NAME).option(
        "step", "wide"
    ).mode("append").save(root)
    back = spark.read.format(FORMAT_NAME).option("step", "wide").load(root)
    assert back.rdd.getNumPartitions() > 1
    assert back.count() == 1000


def test_filter_pushdown_correctness(spark, tmp_path):
    root = str(tmp_path)
    _seed(spark, root)
    back = spark.read.format(FORMAT_NAME).option("step", "seed").load(root)
    got = sorted(
        r.id
        for r in back.where(
            (F.col("bucket") == 3) & (F.col("id") >= 10) & (F.col("id") < 80)
        ).collect()
    )
    want = [i for i in range(10, 80) if i % 7 == 3]
    assert got == want
    # IN + null-check path
    assert (
        back.where(F.col("bucket").isin(0, 6) & F.col("x").isNotNull()).count()
        == sum(1 for i in range(100) if i % 7 in (0, 6))
    )


def test_failed_write_commits_nothing(spark, tmp_path):
    root = str(tmp_path)
    _seed(spark, root, n=10)
    bad = spark.range(10).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.when(F.col("id") < 5, F.col("id") * 1.0)
        .otherwise(F.raise_error("boom"))
        .alias("x"),
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format(FORMAT_NAME).option("step", "seed").mode("append").save(root)
    # the guarantee: no version was committed by the failed job.  (A
    # cancelled task may recreate its _staging-* dir after driver-side
    # abort() sweeps it — harmless litter: readers match only v=N dirs.)
    assert list_versions(root, "seed") == [1]
    # and the failed job does not perturb subsequent writes or reads
    _seed(spark, root, n=4)
    assert list_versions(root, "seed") == [1, 2]
    assert (
        spark.read.format(FORMAT_NAME).option("step", "seed").load(root).count() == 4
    )


def test_stream_versions_as_microbatches(spark, tmp_path):
    root = str(tmp_path)
    _seed(spark, root, n=3)
    _seed(spark, root, n=4)
    q = (
        spark.readStream.format(FORMAT_NAME)
        .option("step", "seed")
        .option("startingOffsets", "earliest")
        .load(root)
        .writeStream.format("memory")
        .queryName("versioned_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n FROM versioned_stream").collect()[0].n
    assert got == 7  # both historical versions replayed
