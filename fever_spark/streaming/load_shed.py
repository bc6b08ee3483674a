"""Backpressure / load-shedding: fever's input-buffer overflow policy.

The reference NEVER blocks its producer: when the in-buffer (default
500,000 EVE objects, cmd/fever/cmds/run.go:621-624) is full, incoming
events are DROPPED and counted (input/input_socket.go:81-89 — increment
``dropped-events`` metric, continue). Round 1 recorded this as the one
streaming capability without an analog; this module closes it.

Structured Streaming already gives admission control at the source
(maxFilesPerTrigger / maxOffsetsPerTrigger = fever's buffer length knob).
What it lacks is the OVERFLOW side: a per-trigger processing budget with
a drop-and-count policy when a burst exceeds it. ``LoadSheddingSink``
provides that inside foreachBatch:

- each micro-batch is capped at ``max_rows_per_batch``;
- overflow rows are dropped DETERMINISTICALLY — rows are ranked by
  xxhash64(all columns), so which rows survive a replayed batch is stable
  (at-least-once replays shed the same rows, keeping downstream counts
  consistent) and the kept subset is an unbiased sample of the burst,
  not a prefix of whatever partition order the source produced;
- drops are COUNTED, never silent: ``dropped_rows`` / ``ingested_rows``
  totals plus a per-batch record, mirroring fever's dropped-events metric
  (README.md:40 in the reference describes the same contract).

The cap is enforced with ``RDD-free`` DataFrame ops (rank via a global
sort is avoided: a per-partition quota computed from partition sizes would
also work, but at cap sizes worth shedding the hash-threshold probe below
is one pass and no global sort).

Shedding strategy: instead of a true top-K (global sort = shuffle), the
sink takes the batch count (cheap, usually already cached by the source),
computes the keep PROBABILITY cap/n, and keeps rows whose bucket
``xxhash64(cols) % 1_000_000 < p * 1_000_000``. That keeps ~cap rows in
one scan with no shuffle — the same deterministic-hash discipline as
operators/sampling.py — and the exact count of kept/dropped rows is
reported from the observed metrics, not estimated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


@dataclass
class BatchRecord:
    batch_id: int
    arrived: int
    kept: int
    dropped: int


@dataclass
class LoadSheddingSink:
    """foreachBatch wrapper enforcing a per-trigger row budget.

    ``sink(df, batch_id)`` → calls ``downstream(kept_df, batch_id)`` with at
    most ~max_rows_per_batch rows and records the drop accounting. Use as::

        shed = LoadSheddingSink(max_rows_per_batch=100_000,
                                downstream=acc.process_batch)
        stream.writeStream.foreachBatch(shed).start()

    max_rows_per_batch mirrors fever's flushcount cap (100,000 events,
    cmd/fever/cmds/run.go:649-650); the drop policy mirrors in-buffer-drop.
    """

    max_rows_per_batch: int
    downstream: object  # Callable[[DataFrame, int], None]
    seed: int = 0
    ingested_rows: int = 0
    dropped_rows: int = 0
    # keyed by batch_id; counters adjust INCREMENTALLY on insert/replace, so
    # a long-running stream pays O(1) memory+work per batch in this
    # driver-side sink, and keep_last bounds the per-batch records the way
    # fever bounds its metrics buffers (cumulative counters never truncate)
    records: dict[int, BatchRecord] = field(default_factory=dict)
    keep_last: int = 10_000

    @property
    def history(self) -> list[BatchRecord]:
        """Per-batch records, oldest first (bounded to the last
        ``keep_last`` batches; cumulative counters cover all batches)."""
        return [self.records[b] for b in sorted(self.records)]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # one materialization for all three uses (arrived count, kept count,
        # downstream action) — an overload-protection sink must not triple
        # the source scan exactly when the source is bursting
        batch_df.persist()
        try:
            arrived = batch_df.count()
            if arrived <= self.max_rows_per_batch:
                kept_df, kept = batch_df, arrived
            else:
                p = self.max_rows_per_batch / arrived
                # never floor to zero: a positive budget must admit rows
                threshold = max(1, int(p * _BUCKETS))
                bucket = F.pmod(
                    F.xxhash64(*batch_df.columns, F.lit(self.seed)),
                    F.lit(_BUCKETS))
                kept_df = batch_df.filter(bucket < threshold)
                kept = kept_df.count()
            rec = BatchRecord(batch_id, arrived, kept, arrived - kept)
            # at-least-once replays re-deliver the same batch_id: replace the
            # old record instead of double-counting (idempotent accounting,
            # same discipline as StreamingSketchAccumulator's replay dedupe)
            old = self.records.pop(batch_id, None)
            if old is not None:
                self.ingested_rows -= old.kept
                self.dropped_rows -= old.dropped
            self.records[batch_id] = rec
            self.ingested_rows += rec.kept
            self.dropped_rows += rec.dropped
            if len(self.records) > self.keep_last:
                # evict oldest records only — a replayed batch older than
                # the window would re-add its counts, but Structured
                # Streaming replays only the LAST uncommitted batch
                for b in sorted(self.records)[:len(self.records)
                                              - self.keep_last]:
                    del self.records[b]
            if kept:
                self.downstream(kept_df, batch_id)
        finally:
            batch_df.unpersist()

    @property
    def metrics(self) -> dict:
        """fever metrics-submitter shape: cumulative counters."""
        return {"ingested_rows": self.ingested_rows,
                "dropped_rows": self.dropped_rows,
                "batches": len(self.records)}


def admission_controlled_file_stream(spark, path: str, schema,
                                     max_files_per_trigger: int = 1):
    """Source-side buffer-length knob: a file stream that admits at most
    ``max_files_per_trigger`` files per micro-batch — the Structured
    Streaming equivalent of fever's in-buffer-length (the queue the drop
    policy protects). Pair with LoadSheddingSink for the full overflow
    contract."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))
