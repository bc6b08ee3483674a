"""Offline batch alertify CLI — fever entry point 3
(/root/reference/cmd/fever/cmds/alertify.go): EVE-JSON lines in, alert
JSON lines out, matching IOCs by exact equality on sni / rrname /
http host / url (alertify.go:59-110+).

    python -m fever_spark.jobs.alertify --input eve.jsonl --output outdir \
        --iocs iocs.txt [--prefix ALERTIFY]

A pure batch map: read → parse/project → match → rewrite → write, the
spark-submit shape of the reference's stdin/stdout pipe.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fever_spark.sources.eve import make_alert_json, parse_eve

DEFAULT_PREFIX = "ALERTIFY"  # cmd/fever/cmds/alertify.go default


def alertify(df_lines: DataFrame, iocs: list[str],
             prefix: str = DEFAULT_PREFIX) -> DataFrame:
    """EVE lines DataFrame (column `value`) → alert rows with rewritten
    JSON. Equality matching (not Bloom) like the reference CLI."""
    parsed = parse_eve(df_lines).filter(F.col("event_type").isNotNull())
    ioc_arr = F.array(*[F.lit(i) for i in iocs])

    matched = parsed.withColumn(
        "ioc",
        F.when(F.array_contains(ioc_arr, F.col("tls_sni")), F.col("tls_sni"))
        .when(F.array_contains(ioc_arr, F.col("dns_rrname")), F.col("dns_rrname"))
        .when(F.array_contains(ioc_arr, F.col("http_host")), F.col("http_host"))
        .when(F.array_contains(ioc_arr, F.col("http_url")), F.col("http_url"))
    ).filter(F.col("ioc").isNotNull())

    mt = (F.when(F.col("ioc") == F.col("tls_sni"), F.lit("Possibly bad TLS SNI: "))
          .when(F.col("ioc") == F.col("dns_rrname"), F.lit("Possibly bad DNS lookup to "))
          .when(F.col("ioc") == F.col("http_host"), F.lit("Possibly bad HTTP host: "))
          .otherwise(F.lit("Possibly bad HTTP URL: ")))
    signature = F.concat(F.lit(prefix + " "), mt, F.col("ioc"))
    return make_alert_json(matched, F.col("ioc"), signature)


def main(argv=None):
    from fever_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="EVE JSON-lines file/dir")
    ap.add_argument("--output", required=True, help="output dir (JSON lines)")
    ap.add_argument("--iocs", required=True, help="file with one IOC per line")
    ap.add_argument("--prefix", default=DEFAULT_PREFIX)
    ap.add_argument("--spool", default=None,
                    help="also publish alerts through the submitter sink "
                         "(fever forwards alerts via StatsSubmitter)")
    ap.add_argument("--compress", action="store_true",
                    help="gzip spool payloads (submitter UseCompression)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    with open(args.iocs) as f:
        iocs = [ln.strip() for ln in f if ln.strip()]
    spark = get_spark(master=args.master, app_name="fever_spark_alertify")
    lines = spark.read.text(args.input)
    alerts = alertify(lines, iocs, prefix=args.prefix)
    # the match pipeline feeds up to three actions (spool publish, text
    # write, count) — persist so parse + IOC matching run once
    out = alerts.select("alert_json").persist()
    try:
        if args.spool:
            from fever_spark.sources.submitter import submit_dataframe
            submit_dataframe(out, args.spool, "alertify.alerts",
                             compress=args.compress)
        out.write.mode("overwrite").text(args.output)
        print(f'{{"alerts": {out.count()}, "output": "{args.output}"}}')
    finally:
        out.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
