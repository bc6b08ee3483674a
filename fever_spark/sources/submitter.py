"""Alert/stats submitter sink — fever's S12 (AMQP submitter) analog.

Behavior reference: /root/reference/util/submitter.go:7-12 (the
``StatsSubmitter`` interface: ``Submit(rawData, key, contentType)`` +
``SubmitWithHeaders``) and /root/reference/util/submitter_amqp.go:19-236
(the AMQP implementation: optional gzip compression with a
``compressed`` header and ``gzip`` content encoding, ``sensor_id``
header, reconnect-on-failure retry loop, named exchange target).

No broker is reachable from a sandboxed batch job, and fever itself
tests this component against an in-process fake
(util/submitter_test.go). The shippable piece is therefore the same
seam: :class:`SpoolSubmitter` publishes each message as one ATOMIC file
in a spool directory (write to a dot-tmp name, then ``os.replace`` — a
consumer never observes a partial message), with a JSON envelope
carrying routing key, content type, headers, and the gzip encoding
flag. A real AMQP/Kafka client drops in behind the same ``submit()``
signature without touching the Spark side.

Spark shape — submission is a SINK, and it must not funnel through the
driver: :func:`submit_dataframe` ships each Arrow batch of each
partition as ONE batched message (fever batches its stats submissions
the same way — util/performance_stats_encoder.go) from INSIDE
``mapInPandas``, so executors publish in parallel and the driver only
sees the message count. Message file names are content hashes, so a
replayed task/micro-batch overwrites its own messages instead of
duplicating them: at-least-once task retries compose with the
idempotent spool into exactly-once on disk for identical payloads.
:func:`foreach_batch_submitter` adapts the same path to Structured
Streaming's ``foreachBatch``.

Spool naming format note (operational): since round 6 the file name
hashes the full message identity — metadata (key, content_type,
encoding, headers) PLUS payload — where earlier versions hashed the
payload alone. Replays of pre-upgrade messages therefore land under NEW
names and will not dedupe against their pre-upgrade spool files: drain
the spool before deploying a version with a different naming scheme, or
accept duplicate delivery for checkpoint replays that span the upgrade.
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import json
import os
import time
from base64 import b64decode, b64encode
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["SpoolSubmitter", "consume_spool", "submit_dataframe",
           "foreach_batch_submitter"]

_ENVELOPE_VERSION = 1


class SpoolSubmitter:
    """File-spool StatsSubmitter (fever util/submitter.go:7-12 contract).

    ``max_retries``/``retry_wait_s`` stand in for the AMQP impl's
    reconnect-on-failure loop (submitter_amqp.go:59-86): a transient
    filesystem error is retried with a linear backoff before raising.
    """

    def __init__(self, spool_dir: str, compress: bool = False,
                 sensor_id: str = "fever-spark", max_retries: int = 3,
                 retry_wait_s: float = 0.05):
        self.spool_dir = spool_dir
        self.compress = compress
        self.sensor_id = sensor_id
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        os.makedirs(spool_dir, exist_ok=True)

    def use_compression(self) -> None:
        """Enable gzip payload compression (submitter_amqp.go:165)."""
        self.compress = True

    def finish(self) -> None:
        """Close the submitter (StatsSubmitter.Finish, submitter.go:12).

        The AMQP impl closes its channel; the spool's messages are already
        durable at ``os.replace`` time, so this fsyncs the directory entry
        table and is then a no-op — but it completes the four-method
        contract so a broker-backed drop-in replacement has a close hook."""
        try:
            fd = os.open(self.spool_dir, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        except OSError:
            pass  # e.g. O_RDONLY dir fsync unsupported on this FS

    def submit(self, raw_data: bytes, key: str, content_type: str) -> str:
        return self.submit_with_headers(raw_data, key, content_type, None)

    def submit_with_headers(self, raw_data: bytes, key: str,
                            content_type: str,
                            headers: dict | None) -> str:
        """Publish one message; returns its spool file name.

        The name is a content hash of the FULL message identity — routing
        key, content type, encoding, headers, and the (pre-compression)
        payload — so re-submitting an identical message lands on the same
        file (the idempotence that makes Spark task retries safe), while
        two submits that differ in any metadata field land on distinct
        files instead of last-writer-wins overwriting each other. Hashing
        the raw payload rather than the gzip output keeps the name
        deterministic across gzip implementations/mtimes."""
        if self.compress:
            payload, encoding, compressed = (
                _gzip.compress(raw_data), "gzip", "true")
        else:
            payload, encoding, compressed = raw_data, "", "false"
        all_headers = {"sensor_id": self.sensor_id,
                       "compressed": compressed}
        if headers:
            all_headers.update(headers)
        envelope = json.dumps({
            "v": _ENVELOPE_VERSION,
            "key": key,
            "content_type": content_type,
            "content_encoding": encoding,
            "headers": all_headers,
            "payload_b64": b64encode(payload).decode("ascii"),
        }, sort_keys=True).encode("utf-8")
        meta = json.dumps(
            {"key": key, "content_type": content_type,
             "content_encoding": encoding, "headers": all_headers},
            sort_keys=True).encode("utf-8")
        name = hashlib.sha256(
            meta + b"\x00" + raw_data).hexdigest()[:40] + ".msg"
        final = os.path.join(self.spool_dir, name)
        tmp = os.path.join(self.spool_dir, f".tmp-{os.getpid()}-{name}")
        err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                with open(tmp, "wb") as fh:
                    fh.write(envelope)
                os.replace(tmp, final)  # atomic: no partials ever visible
                return name
            except OSError as exc:  # the "reconnect" path
                err = exc
                time.sleep(self.retry_wait_s * (attempt + 1))
        try:  # don't leave a partial tmp behind after giving up
            os.unlink(tmp)
        except OSError:
            pass
        raise RuntimeError(
            f"submit failed after {self.max_retries + 1} attempts") from err


def consume_spool(spool_dir: str, ack: bool = True) -> list[dict]:
    """Drain the spool: decoded messages (gzip transparently undone),
    sorted by file name for determinism. ``ack=True`` deletes each file
    after a successful read (the consumer-side acknowledge)."""
    out = []
    for name in sorted(os.listdir(spool_dir)):
        if not name.endswith(".msg") or name.startswith("."):
            continue  # dot-tmp partials and foreign files are invisible
        path = os.path.join(spool_dir, name)
        with open(path, "rb") as fh:
            env = json.loads(fh.read().decode("utf-8"))
        payload = b64decode(env["payload_b64"])
        if env["content_encoding"] == "gzip":
            payload = _gzip.decompress(payload)
        env["payload"] = payload
        del env["payload_b64"]
        out.append(env)
        if ack:
            os.unlink(path)
    return out


def submit_dataframe(df: DataFrame, spool_dir: str, key: str,
                     content_type: str = "application/json",
                     compress: bool = False,
                     sensor_id: str = "fever-spark") -> int:
    """Publish a DataFrame through the submitter seam, one message per
    Arrow batch per partition (executor-side, parallel, no driver
    collect). Payload is JSON-lines of the batch's rows; the routing
    key gains a ``.p<partition>.<seq>`` suffix (traceability, mirroring
    fever's per-sensor routing). Returns the number of messages."""
    cols = df.columns

    def publish(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sub = SpoolSubmitter(spool_dir, compress=compress,
                             sensor_id=sensor_id)
        n = 0
        for seq, pdf in enumerate(batches):
            if len(pdf) == 0:
                continue
            raw = pdf[cols].to_json(orient="records",
                                    date_format="iso").encode("utf-8")
            sub.submit(raw, f"{key}.p{pid}.{seq}", content_type)
            n += 1
        yield pd.DataFrame({"messages": [n]})

    counts = df.mapInPandas(publish, schema="messages long")
    total = counts.agg(F.sum("messages")).first()[0]
    return int(total or 0)


def foreach_batch_submitter(spool_dir: str, key: str,
                            content_type: str = "application/json",
                            compress: bool = False):
    """``writeStream.foreachBatch`` adapter: each micro-batch is
    published with the batch id spliced into the routing key. Content-
    hash names make micro-batch REPLAY (the at-least-once case after a
    checkpoint restart) overwrite rather than duplicate."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        submit_dataframe(batch_df, spool_dir, f"{key}.b{batch_id}",
                         content_type=content_type, compress=compress)
    return sink
