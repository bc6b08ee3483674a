"""F8 IP byte encoding, F9 bounds guards, J5/F12 rDNS enrichment."""

import pytest
from pyspark.sql import functions as F
from pyspark.errors import PySparkException

from fever_spark.functions import net


class TestIPBytes:
    def test_reversed_little_endian(self, spark):
        df = spark.createDataFrame([("1.2.3.4",), ("bad",), (None,)], "ip string")
        got = [r["b"] for r in
               df.select(net.ipv4_to_reversed_bytes(F.col("ip")).alias("b")).collect()]
        assert bytes(got[0]) == bytes([4, 3, 2, 1])  # flow_event.go byte-reverse
        assert got[1] is None and got[2] is None


class TestBounds:
    def test_checked_ok(self, spark):
        df = spark.createDataFrame([(0,), (4294967295,)], "v long")
        vals = [r["c"] for r in df.select(net.checked_uint32(F.col("v")).alias("c")).collect()]
        assert vals == [0, 4294967295]

    def test_checked_overflow_raises(self, spark):
        df = spark.createDataFrame([(4294967296,)], "v long")
        with pytest.raises(PySparkException, match="uint32"):
            df.select(net.checked_uint32(F.col("v"), "pkts").alias("c")).collect()

    def test_clamped(self, spark):
        df = spark.createDataFrame([(-5,), (99,), (5000000000,)], "v long")
        vals = [r["c"] for r in df.select(net.clamped_uint32(F.col("v")).alias("c")).collect()]
        assert vals == [0, 99, 4294967295]


class TestRDNS:
    @pytest.fixture()
    def ips_df(self, spark):
        return spark.createDataFrame(
            [("10.0.0.7",), ("8.8.8.8",), ("192.168.1.3",)], "src_ip string")

    def test_broadcast_join_private_gate(self, spark, ips_df):
        lookup = net.rdns_table(spark, ["10.0.0.7", "8.8.8.8", "192.168.1.3"])
        out = net.enrich_rdns_join(ips_df, lookup, "src_ip").toPandas() \
            .set_index("src_ip")["src_ip_rdns"]
        assert out["10.0.0.7"] == "host-7.rdns.example"
        assert out["192.168.1.3"] == "host-3.rdns.example"
        assert out["8.8.8.8"] is None  # public IP not enriched (rdns_handler.go:69-73)

    def test_broadcast_plan(self, spark, ips_df):
        lookup = net.rdns_table(spark, ["10.0.0.7"])
        plan = net.enrich_rdns_join(ips_df, lookup, "src_ip") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in plan

    def test_mapped_cache_variant_trims_dot(self, spark, ips_df):
        out = net.enrich_rdns_mapped(ips_df, "src_ip").toPandas() \
            .set_index("src_ip")["src_ip_rdns"]
        assert out["10.0.0.7"] == "host-7.rdns.example"  # no trailing dot
        assert not out["10.0.0.7"].endswith(".")
