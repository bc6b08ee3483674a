"""Composed EVE pipeline — fever's main processing loop as ONE streaming job.

The reference daemon (cmd/fever/main.go wiring: input socket → Entry parse
→ handler chain — BloomHandler alerting, forward sinks, aggregate stats
submission) re-expressed as a Structured Streaming job over a drop
directory of EVE JSON-lines files (the batch analog of the socket source,
same seam as S3/alertify):

    files → parse_eve → ┬ bloom_match_events → alerts parquet [+ spool]
                        ├ per-type forward dirs (S11 multi_forward)
                        └ per-event-type sketch stats (HLL/CMS states)

Every micro-batch runs the whole chain once over ONE parse (persisted for
the batch, unpersisted after). Exactly-once composition — the same
argument jobs/ingest.stream_ingest tests: the file-source checkpoint
makes each input file contribute to exactly one batch id; every sink is
keyed by ``batch=<id>`` with idempotent overwrite (a replayed batch
rewrites its own outputs); the submitter spool's content-hash names make
replayed publishes overwrite too; the sketch accumulator drops replayed
batch ids outright.

Scale shape: parse + match are the batch plans unchanged (one Arrow
round-trip for all seven Bloom probes); stats shuffle O(groups × state)
per batch; nothing new collects to the driver (alert counts come from
the written parquet's metadata, sketch states spill to parquet in
``state_dir`` mode).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fever_spark.ops.bloom_match import bloom_match_events, build_ioc_filter
from fever_spark.ops.build import SketchSpec
from fever_spark.sources.eve import parse_eve
from fever_spark.streaming.sketch_stream import StreamingSketchAccumulator

__all__ = ["run_pipeline"]


def default_stats_specs() -> list[SketchSpec]:
    """The daemon's default per-event-type stats: distinct source IPs
    (HLL) and heavy-hitter HTTP hosts (CMS) — the fever flow/stats
    aggregation shapes as mergeable states."""
    return [
        SketchSpec("src_ips", "hll", "src_ip", {"p": 12}),
        SketchSpec("http_hosts", "cms", "http_host",
                   {"epsilon": 1e-3, "delta": 1e-3}),
    ]


def run_pipeline(spark: SparkSession, input_dir: str, output_dir: str,
                 iocs: list[str], checkpoint: str,
                 blacklist: list[str] | None = None,
                 spool: str | None = None,
                 forwards: dict[str, list[str]] | None = None,
                 stats_specs: list[SketchSpec] | None = None,
                 stats_state_dir: str | None = None,
                 max_files_per_trigger: int = 16,
                 available_now: bool = True):
    """Run the composed pipeline over ``input_dir``.

    ``forwards`` maps output name → event-type list ([] = everything);
    each batch writes ``output_dir/forward/<name>/batch=<id>`` JSON (the
    S11 per-output type filter). ``spool`` additionally publishes each
    batch's alerts through the submitter sink. ``stats_state_dir``
    switches the sketch accumulator to parquet spill (unbounded key
    domains); default accumulates driver-side over the bounded
    event-type domain.

    ``available_now=True`` (default) drains everything currently in the
    drop dir and returns a summary dict; ``False`` returns the running
    ``StreamingQuery`` (caller manages its lifecycle)."""
    bf = build_ioc_filter(iocs, fpp=1e-7)
    bc = spark.sparkContext.broadcast(bf.to_bytes())
    acc = StreamingSketchAccumulator(
        keys=["event_type"],
        specs=stats_specs if stats_specs is not None else default_stats_specs(),
        state_dir=stats_state_dir)

    alerts_root = os.path.join(output_dir, "alerts")

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = (parse_eve(batch_df)
                  .filter(F.col("event_type").isNotNull())
                  .persist())
        try:
            alerts = bloom_match_events(parsed, bc, blacklist=blacklist)
            alerts.write.mode("overwrite").parquet(
                os.path.join(alerts_root, f"batch={batch_id}"))
            if spool:
                from fever_spark.sources.submitter import submit_dataframe
                submit_dataframe(alerts, spool, f"fever.alerts.b{batch_id}")
            for name, types_ in (forwards or {}).items():
                part = (parsed.filter(F.col("event_type").isin(types_))
                        if types_ else parsed)
                part.drop("json_line").write.mode("overwrite").json(
                    os.path.join(output_dir, "forward", name,
                                 f"batch={batch_id}"))
            acc.process_batch(parsed, batch_id)
        finally:
            parsed.unpersist()

    stream = (spark.readStream
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .text(input_dir))
    writer = (stream.writeStream
              .foreachBatch(_batch)
              .option("checkpointLocation", checkpoint))
    if not available_now:
        return writer.start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    # summary from the durable outputs, not driver counters. A run with
    # ZERO batches (empty drop dir, or everything already checkpointed)
    # never had a sink write create output_dir — make it for the manifest
    os.makedirs(output_dir, exist_ok=True)
    batches = sorted(d for d in (os.listdir(alerts_root)
                                 if os.path.isdir(alerts_root) else [])
                     if d.startswith("batch="))
    n_alerts = (spark.read.parquet(alerts_root).count() if batches else 0)
    summary = {"input": input_dir, "output": output_dir,
               "batches": len(batches), "alerts": int(n_alerts),
               "stats_groups": (len(acc.sketches)
                                if stats_state_dir is None else None),
               "spool": spool}
    with open(os.path.join(output_dir, "_run_manifest.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main(argv: list[str] | None = None) -> None:
    import argparse

    from fever_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="EVE JSONL drop dir")
    ap.add_argument("--output", required=True)
    ap.add_argument("--iocs", required=True, help="one IOC per line")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--spool", default=None)
    ap.add_argument("--forward", action="append", default=[],
                    help="name=type1,type2 (repeatable; empty types = all)")
    ap.add_argument("--stats-state-dir", default=None)
    ap.add_argument("--continuous", action="store_true",
                    help="keep running instead of drain-and-exit")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    with open(args.iocs) as f:
        iocs = [ln.strip() for ln in f if ln.strip()]
    forwards = {}
    for spec in args.forward:
        name, _, types_ = spec.partition("=")
        forwards[name] = [t for t in types_.split(",") if t]
    spark = get_spark(master=args.master, app_name="fever_spark_run")
    out = run_pipeline(spark, args.input, args.output, iocs,
                       checkpoint=args.checkpoint, spool=args.spool,
                       forwards=forwards or None,
                       stats_state_dir=args.stats_state_dir,
                       available_now=not args.continuous)
    if args.continuous:
        out.awaitTermination()
    else:
        print(json.dumps(out))
        spark.stop()


if __name__ == "__main__":
    main()
