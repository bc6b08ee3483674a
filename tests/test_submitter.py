"""Submitter sink (sources/submitter.py) — fever's S12 StatsSubmitter.

Mirrors fever's own strategy of testing the submitter contract against an
in-process implementation (reference util/submitter_test.go): the spool IS
the endpoint, so the full Submit/SubmitWithHeaders/UseCompression/Finish
surface (util/submitter.go:7-13) is exercised for real, plus the Spark
sink shape (executor-side publish, task-retry idempotence, foreachBatch
replay overwrite).
"""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from fever_spark.sources.submitter import (SpoolSubmitter, consume_spool,
                                           foreach_batch_submitter,
                                           submit_dataframe)


class TestSpoolSubmitter:
    def test_submit_roundtrip(self, tmp_path):
        sub = SpoolSubmitter(str(tmp_path), sensor_id="sensor-7")
        sub.submit(b'{"a": 1}', "alerts.key", "application/json")
        msgs = consume_spool(str(tmp_path))
        assert len(msgs) == 1
        m = msgs[0]
        assert m["key"] == "alerts.key"
        assert m["content_type"] == "application/json"
        assert m["payload"] == b'{"a": 1}'
        assert m["content_encoding"] == ""
        # AMQP-impl header parity (submitter_amqp.go: sensor_id +
        # compressed always present)
        assert m["headers"]["sensor_id"] == "sensor-7"
        assert m["headers"]["compressed"] == "false"
        # ack=True drained the spool
        assert consume_spool(str(tmp_path)) == []

    def test_submit_with_headers_merges_over_defaults(self, tmp_path):
        sub = SpoolSubmitter(str(tmp_path))
        sub.submit_with_headers(b"x", "k", "text/plain",
                                {"trace": "t1", "sensor_id": "override"})
        (m,) = consume_spool(str(tmp_path))
        assert m["headers"]["trace"] == "t1"
        # caller-supplied headers win, like amqp.Table assignment order
        assert m["headers"]["sensor_id"] == "override"

    def test_compression_flag_and_transparent_decode(self, tmp_path):
        sub = SpoolSubmitter(str(tmp_path))
        sub.use_compression()
        raw = b"payload " * 100
        name = sub.submit(raw, "k", "application/json")
        # on-disk payload really is gzip (not just labeled)
        with open(tmp_path / name, "rb") as fh:
            env = json.loads(fh.read())
        from base64 import b64decode
        stored = b64decode(env["payload_b64"])
        assert stored != raw and gzip.decompress(stored) == raw
        assert env["content_encoding"] == "gzip"
        assert env["headers"]["compressed"] == "true"
        # consumer sees the original bytes
        (m,) = consume_spool(str(tmp_path))
        assert m["payload"] == raw

    def test_idempotent_resubmit_single_file(self, tmp_path):
        sub = SpoolSubmitter(str(tmp_path))
        n1 = sub.submit(b"same", "k", "t")
        n2 = sub.submit(b"same", "k", "t")
        assert n1 == n2
        assert len(list(tmp_path.glob("*.msg"))) == 1
        # different key or payload -> different file
        sub.submit(b"same", "k2", "t")
        sub.submit(b"other", "k", "t")
        assert len(list(tmp_path.glob("*.msg"))) == 3

    def test_metadata_is_part_of_idempotence_key(self, tmp_path):
        # same key+payload but different content_type / headers / compress
        # flag are DIFFERENT messages — no last-writer-wins overwrite
        sub = SpoolSubmitter(str(tmp_path))
        sub.submit(b"same", "k", "application/json")
        sub.submit(b"same", "k", "text/plain")
        sub.submit_with_headers(b"same", "k", "application/json",
                                {"trace": "abc"})
        gz = SpoolSubmitter(str(tmp_path), compress=True)
        gz.submit(b"same", "k", "application/json")
        assert len(list(tmp_path.glob("*.msg"))) == 4
        # and each variant stays idempotent with itself
        sub.submit(b"same", "k", "text/plain")
        assert len(list(tmp_path.glob("*.msg"))) == 4

    def test_partials_invisible_to_consumer(self, tmp_path):
        # a crashed-mid-write tmp has the REAL tmp naming (ends in .msg —
        # the dot prefix alone must hide it)
        (tmp_path / ".tmp-123-deadbeef.msg").write_bytes(b"garbage")
        (tmp_path / "notes.txt").write_bytes(b"foreign")
        sub = SpoolSubmitter(str(tmp_path))
        sub.submit(b"real", "k", "t")
        msgs = consume_spool(str(tmp_path))
        assert [m["payload"] for m in msgs] == [b"real"]

    def test_retry_then_success(self, tmp_path, monkeypatch):
        # transient failure path = the AMQP reconnect loop
        # (submitter_amqp.go:59-86): first replace attempts fail, then ok
        sub = SpoolSubmitter(str(tmp_path), max_retries=3,
                             retry_wait_s=0.001)
        real_replace, fails = os.replace, {"n": 2}

        def flaky(src, dst):
            if fails["n"] > 0:
                fails["n"] -= 1
                raise OSError("transient")
            return real_replace(src, dst)

        monkeypatch.setattr(os, "replace", flaky)
        sub.submit(b"x", "k", "t")
        assert len(consume_spool(str(tmp_path))) == 1

    def test_retries_exhausted_raises_no_partial_left(self, tmp_path,
                                                      monkeypatch):
        sub = SpoolSubmitter(str(tmp_path), max_retries=1,
                             retry_wait_s=0.001)
        monkeypatch.setattr(os, "replace",
                            lambda s, d: (_ for _ in ()).throw(OSError("down")))
        with pytest.raises(RuntimeError, match="after 2 attempts"):
            sub.submit(b"x", "k", "t")
        assert list(tmp_path.iterdir()) == []  # tmp cleaned up

    def test_finish_contract(self, tmp_path):
        sub = SpoolSubmitter(str(tmp_path))
        sub.submit(b"x", "k", "t")
        sub.finish()  # must not raise; messages stay durable
        assert len(consume_spool(str(tmp_path))) == 1


class TestSubmitDataFrame:
    def test_rows_survive_and_executor_side_publish(self, spark, tmp_path):
        spool = str(tmp_path / "spool")
        df = spark.range(0, 100, 1, 4).select(
            F.col("id"), (F.col("id") * 2).alias("v"))
        n = submit_dataframe(df, spool, "stats.batch")
        assert n >= 1
        msgs = consume_spool(spool, ack=False)
        assert len(msgs) == n
        rows = [r for m in msgs for r in json.loads(m["payload"])]
        assert sorted((r["id"], r["v"]) for r in rows) == [
            (i, 2 * i) for i in range(100)]
        # routing keys carry the partition/seq suffix
        assert all(m["key"].startswith("stats.batch.p") for m in msgs)

    def test_replay_overwrites_not_duplicates(self, spark, tmp_path):
        spool = str(tmp_path / "spool")
        df = spark.range(0, 50, 1, 2).select("id")
        submit_dataframe(df, spool, "k")
        first = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(spool, "*.msg")))
        # a task retry / job re-run re-submits identical batches
        submit_dataframe(df, spool, "k")
        second = sorted(os.path.basename(p)
                        for p in glob.glob(os.path.join(spool, "*.msg")))
        assert first == second

    def test_compressed_dataframe_payloads(self, spark, tmp_path):
        spool = str(tmp_path / "spool")
        df = spark.range(0, 10, 1, 1).select("id")
        submit_dataframe(df, spool, "k", compress=True)
        (m,) = consume_spool(spool)
        assert m["content_encoding"] == "gzip"
        assert [r["id"] for r in json.loads(m["payload"])] == list(range(10))


class TestAlertifySpool:
    def test_alerts_published_through_submitter(self, spark, tmp_path):
        # the fever integration: alertify forwards alerts via StatsSubmitter
        from fever_spark.jobs.alertify import alertify
        lines = spark.createDataFrame(
            [('{"event_type": "http", "timestamp": "2026-06-01T12:00:00.0+0000",'
              ' "http": {"hostname": "evil.example.com", "url": "/x"}}',)],
            "value string")
        alerts = alertify(lines, ["evil.example.com"]).select("alert_json")
        spool = str(tmp_path / "spool")
        n = submit_dataframe(alerts, spool, "alertify.alerts")
        assert n >= 1
        payload = b"".join(m["payload"] for m in consume_spool(spool))
        rows = json.loads(payload)
        assert json.loads(rows[0]["alert_json"])["alert"]["signature"].startswith(
            "ALERTIFY Possibly bad HTTP host")


class TestForeachBatchSubmitter:
    def test_batch_id_in_key_and_replay_idempotence(self, spark, tmp_path):
        spool = str(tmp_path / "spool")
        sink = foreach_batch_submitter(spool, "alerts")
        batch = spark.range(0, 5, 1, 1).select("id")
        sink(batch, 7)
        msgs = consume_spool(spool, ack=False)
        assert all(m["key"].startswith("alerts.b7.p") for m in msgs)
        files = sorted(os.listdir(spool))
        sink(batch, 7)  # checkpoint-restart replay of the same batch id
        assert sorted(os.listdir(spool)) == files
