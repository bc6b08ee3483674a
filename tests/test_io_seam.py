"""Iceberg-or-parquet IO seam (sources/io.py).

The sandbox has no Iceberg runtime jar, so every integration test runs the
parquet branch. These tests pin the ICEBERG branch's catalog-API contract
with a stubbed ``iceberg_available`` (VERDICT round-2 #7): if the writeTo /
partitionedBy / createOrReplace calls or the day-partition layout drift,
this fails without needing the jar.
"""

from unittest import mock

import pytest
from pyspark.sql import functions as F

from fever_spark.sources import io as io_seam


class TestIcebergBranchContract:
    def _writer_mock(self):
        writer = mock.MagicMock(name="writer")
        # partitionedBy returns the (possibly new) writer — model chaining
        writer.partitionedBy.return_value = writer
        return writer

    def test_write_table_uses_catalog_writer_with_day_partitioning(self, spark):
        df = mock.MagicMock(name="df")
        writer = self._writer_mock()
        df.writeTo.return_value = writer
        with mock.patch.object(io_seam, "iceberg_available",
                               return_value=True):
            io_seam.write_table(df, "cat.db.pages",
                                partition_by_day_of="warc_ts")
        df.writeTo.assert_called_once_with("cat.db.pages")
        # partition spec must be days(warc_ts) — the Iceberg transform that
        # matches the parquet fallback's day=yyyy-MM-dd physical layout
        (spec,), _ = writer.partitionedBy.call_args
        assert "days(warc_ts)" in str(spec)
        writer.createOrReplace.assert_called_once_with()
        # the parquet fallback must NOT run when the catalog path is taken
        df.write.mode.assert_not_called()

    def test_write_table_unpartitioned_skips_partition_spec(self, spark):
        df = mock.MagicMock(name="df")
        writer = self._writer_mock()
        df.writeTo.return_value = writer
        with mock.patch.object(io_seam, "iceberg_available",
                               return_value=True):
            io_seam.write_table(df, "cat.db.pages")
        writer.partitionedBy.assert_not_called()
        writer.createOrReplace.assert_called_once_with()

    def test_path_target_uses_parquet_even_with_catalog(self, spark):
        # a filesystem path ('/' in target) must stay on the parquet branch
        df = mock.MagicMock(name="df")
        with mock.patch.object(io_seam, "iceberg_available",
                               return_value=True):
            io_seam.write_table(df, "/tmp/pages_out")
        df.writeTo.assert_not_called()
        df.write.mode.assert_called_once_with("overwrite")

    def test_read_pages_uses_iceberg_format_for_table_names(self):
        spark = mock.MagicMock(name="spark")
        loaded = mock.MagicMock(name="df")
        loaded.columns = ["url", "text"]
        spark.read.format.return_value.load.return_value = loaded
        with mock.patch.object(io_seam, "iceberg_available",
                               return_value=True):
            out = io_seam.read_pages(spark, "cat.db.pages")
        spark.read.format.assert_called_once_with("iceberg")
        spark.read.format.return_value.load.assert_called_once_with(
            "cat.db.pages")
        assert out is loaded  # no day column to drop

    def test_read_pages_drops_physical_day_column(self):
        spark = mock.MagicMock(name="spark")
        loaded = mock.MagicMock(name="df")
        loaded.columns = ["url", "text", "day"]
        spark.read.format.return_value.load.return_value = loaded
        with mock.patch.object(io_seam, "iceberg_available",
                               return_value=True):
            out = io_seam.read_pages(spark, "cat.db.pages")
        loaded.drop.assert_called_once_with("day")
        assert out is loaded.drop.return_value


class TestParquetFallbackLayout:
    """The layout the Iceberg contract above must match: one day=YYYY-MM-DD
    partition directory per distinct day of the partition timestamp."""

    def test_day_partition_roundtrip(self, spark, tmp_path):
        import os

        df = spark.createDataFrame(
            [("a", "2024-03-01 10:00:00"), ("b", "2024-03-02 01:00:00"),
             ("c", "2024-03-02 23:59:59")],
            "url string, warc_ts string").withColumn(
            "warc_ts", F.to_timestamp("warc_ts"))
        target = str(tmp_path / "pages")
        io_seam.write_table(df, target, partition_by_day_of="warc_ts")
        days = sorted(d for d in os.listdir(target) if d.startswith("day="))
        assert days == ["day=2024-03-01", "day=2024-03-02"]
        back = io_seam.read_pages(spark, target)
        assert "day" not in back.columns
        assert back.count() == 3
