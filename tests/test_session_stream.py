"""applyInPandasWithState session collector (J4 streaming form) driven on a
real micro-batch stream: flow events arrive over several batches; sessions
emit when the terminal 'flow' event lands, marked iff an 'alert' was seen."""

import json
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fever_spark.streaming import session_collector_stream


def test_session_collector_on_file_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["flow_id", "event_type"])
        (src / name).write_text(pdf.to_json(orient="records", lines=True))

    # batch 1: flow 'a' gets http+alert (marked, not complete);
    #          flow 'b' gets http only
    write_batch("b1.json", [("a", "http"), ("a", "alert"), ("b", "http")])

    stream = (spark.readStream
              .schema("flow_id string, event_type string")
              .json(str(src)))
    out = session_collector_stream(stream, ttl_ms=None)  # see docstring: TTL
    # timeouts fire continuous micro-batches and processAllAvailable never
    # settles; the TTL branch is covered by the batch analog semantics
    q = (out.writeStream.format("memory").queryName("sessions")
         .option("checkpointLocation", ckpt)
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        assert spark.sql("select * from sessions").count() == 0  # nothing complete

        # batch 2: terminal flow event for 'a' → emit marked+complete;
        #          'b' still open
        write_batch("b2.json", [("a", "flow"), ("b", "dns")])
        q.processAllAvailable()
        got = {r["flow_id"]: r for r in spark.sql("select * from sessions").collect()}
        assert "a" in got and "b" not in got
        assert got["a"]["complete"] and got["a"]["marked"]
        assert got["a"]["n_events"] == 3  # http + alert + flow

        # batch 3: 'b' terminates WITHOUT an alert → complete but unmarked
        # (the reference ships only marked flows; the mark bit is how the
        # consumer filters, context_collector.go:118-143)
        write_batch("b3.json", [("b", "flow")])
        q.processAllAvailable()
        got = {r["flow_id"]: r for r in spark.sql("select * from sessions").collect()}
        assert got["b"]["complete"] and not got["b"]["marked"]
        assert got["b"]["n_events"] == 3  # http + dns + flow
    finally:
        q.stop()
