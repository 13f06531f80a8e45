#!/usr/bin/env python3
"""spark-submit entry point for URL-frontier preparation.

    spark-submit --py-files dompa_spark.zip dompa_spark/jobs/frontier.py \
        --urls /path/urls --output /path/fetch_list \
        [--blocklist /path/rules] [--robots /path/robots [--agent A]] \
        [--sitemaps /path/sitemap_docs] [--keep-denied] [--per-host-cap N]

Crawl step 0, before any content is fetched: canonicalize every
candidate URL (textops.url_normalize — defrag, lower scheme/host,
default-port strip, utm_* filter, trailing-slash strip), drop
duplicate fetches (keep the minimum doc_id per canonical URL), apply
the host+path-prefix blocklist (textops.url_filter — rules broadcast),
and optionally cap fetches per host (textops.domain_cap's salted
two-phase rank) so no single host dominates a crawl cycle. At 10^12
candidate URLs this is the cheapest dedup the pipeline will ever run —
every row dropped here saves a fetch, a parse, and every downstream
hashing pass.

Inputs: urls parquet with (doc_id, url); blocklist parquet with
(rule_id, host, path_prefix); robots parquet with (host, robots_txt)
— parsed with full REP group semantics (textops.robots_parse) and
applied for --agent with specific-group-override / longest-match /
allow-wins-ties precedence (textops.robots_filter); sitemaps parquet
in the interleaved span-table shape — parsed through the REAL parser
(textops.sitemap_urls_df) and unioned into the candidate set under the
reserved NEGATIVE doc_id space (-1 - doc_id), so sitemap-discovered
and crawled URLs dedup against each other without id collisions.
Output: one row per SURVIVING fetch (doc_id, url_canon, host) — or
every URL with its verdict columns under --keep-denied (the auditable
form). Prints one JSON stats line.

Order matters and is contractual: normalize FIRST so the blocklist
matches canonical hosts (a rule for 'ex.com' must catch 'EX.COM:80'),
dup-group SECOND so a denied canonical group costs zero rule
evaluations on its duplicates' paths... but rules run on the canonical
URL's own path, so dedup-then-filter and filter-then-dedup agree;
dedup first is strictly cheaper. Robots verdicts run on the canonical
keeper for the same reason (and the fetcher presents the canonical
URL). The per-host cap runs LAST, on surviving fetches only (capping
before the blocklist/robots would let denied URLs consume a host's
budget).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dompa_spark URL frontier prep")
    p.add_argument("--urls", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--blocklist", default=None,
                   help="parquet of (rule_id, host, path_prefix) deny rules")
    p.add_argument("--robots", default=None,
                   help="parquet of (host, robots_txt) crawl policies")
    p.add_argument("--agent", default=None,
                   help="crawler agent token for --robots "
                        "(default: textops.ROBOTS_AGENT)")
    p.add_argument("--sitemaps", default=None,
                   help="parquet of sitemap documents (doc_id, spans) "
                        "to ingest into the candidate set")
    p.add_argument("--discover-sitemaps", action="store_true",
                   help="extract Sitemap: directives from the --robots "
                        "table (textops.robots_sitemaps) and union the "
                        "sitemap-file URLs into the candidate set — a "
                        "crawler has to FETCH the sitemap files before "
                        "it can ingest them with --sitemaps")
    p.add_argument("--per-host-cap", type=int, default=None,
                   help="keep at most N fetches per host (salted rank)")
    p.add_argument("--politeness-window", type=float, default=None,
                   help="hours of crawl budget: cap each host's "
                        "fetches at floor(3600*H / its effective "
                        "Crawl-delay) from --robots (hosts without an "
                        "applicable delay are uncapped; delay 0 is "
                        "explicitly unlimited)")
    p.add_argument("--keep-denied", action="store_true",
                   help="write every URL with verdict columns instead "
                        "of only the surviving fetch list")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)
    if args.per_host_cap is not None and args.per_host_cap < 1:
        p.error("--per-host-cap must be >= 1")
    if args.discover_sitemaps and not args.robots:
        p.error("--discover-sitemaps requires --robots")
    if args.per_host_cap is not None and args.keep_denied:
        p.error(
            "--per-host-cap applies to the fetch list and cannot be "
            "combined with --keep-denied (the audit form carries no "
            "cap verdict) — run the two forms separately"
        )
    if args.politeness_window is not None:
        if not args.robots:
            p.error("--politeness-window requires --robots")
        if args.keep_denied:
            p.error("--politeness-window applies to the fetch list "
                    "and cannot be combined with --keep-denied")
        if args.politeness_window <= 0:
            p.error("--politeness-window must be > 0 hours")

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from dompa_spark import pipeline, textops

    builder = SparkSession.builder.appName("dompa-spark-frontier")
    if args.master:
        builder = builder.master(args.master)
    owns_session = SparkSession.getActiveSession() is None
    spark = pipeline.session_confs(builder).getOrCreate()

    urls = spark.read.parquet(args.urls).select("doc_id", "url")
    if args.sitemaps:
        sm_docs = spark.read.parquet(args.sitemaps)
        sm = textops.sitemap_urls_df(pipeline.parse_nodes_df(sm_docs))
        # one sitemap doc carries many locs, so the reserved negative
        # id is a composite over a HASH slot of the doc_id:
        # -1 - (md5_60(doc_id) % 2^43) * 2^16 - url_pos. Hashing (the
        # same trick the discovery band uses for hosts) bounds the
        # band for ANY doc_id domain — pretrain_corpus assigns
        # xxhash64 surrogate ids spanning the full 64-bit range, which
        # a raw doc_id*65536 composite would overflow under ANSI and
        # stride into the discovery band. The sitemap protocol caps a
        # file at 50,000 URLs, so the 2^16 url_pos stride never
        # collides two locs of one doc; doc-slot birthday collisions
        # start around ~2^21 sitemap docs and, like the discovery
        # band, only blur the audit mapping (ids only elect dup-group
        # keepers; grouping is by url_canon). Band: (-2^59 - 2^16, -1],
        # strictly above the discovery band's -(2^60) base.
        urls = urls.unionByName(
            sm.select(
                (
                    F.lit(-1)
                    - (
                        textops._md5_60_of(
                            F.col("doc_id").cast("string")
                        )
                        % F.lit(2 ** 43)
                    )
                    * F.lit(2 ** 16)
                    - F.col("url_pos")
                ).alias("doc_id"),
                F.col("loc").alias("url"),
            )
        )
    n_sitemap_files = 0
    if args.discover_sitemaps:
        # sitemap-FILE URLs from robots.txt Sitemap: directives become
        # fetch candidates of their own (step 0 of --sitemaps). Their
        # synthetic ids live in a far negative band keyed on
        # md5_60(host): base -(2^60), 2^44 hash slots x 2^16 sm_idx
        # stride — a single host may list up to 65,536 Sitemap lines
        # before striding into a neighbor slot, and host-slot birthday
        # collisions start around ~2^22 robots hosts. Ids only elect
        # dup-group keepers (grouping is by url_canon), so a collision
        # merges nothing — it can only blur the audit mapping. Band:
        # (-2^61, -2^60], disjoint from the --sitemaps band above.
        sm_files = textops.robots_sitemaps(
            spark.read.parquet(args.robots)
        )
        disc = sm_files.select(
            (
                F.lit(-(2 ** 60))
                - (textops._md5_60_of(F.col("host")) % F.lit(2 ** 44))
                * F.lit(2 ** 16)
                - F.col("sm_idx")
            ).alias("doc_id"),
            F.col("url"),
        )
        # the discovery count rides the n_in aggregate below — a
        # separate disc.count() would re-run the whole robots parse
        # as its own job just for a stats line
        urls = urls.withColumn("is_disc", F.lit(False)).unionByName(
            disc.withColumn("is_disc", F.lit(True))
        )

    if args.discover_sitemaps:
        tot = urls.agg(
            F.count("*").alias("n"),
            F.sum(F.col("is_disc").cast("long")).alias("d"),
        ).first()
        n_in, n_sitemap_files = tot["n"], int(tot["d"] or 0)
        urls = urls.drop("is_disc")
    else:
        n_in = urls.count()

    norm = textops.url_normalize(urls)
    # the fetch candidate set: one row per canonical URL (the keeper).
    # NULL-canon (null url) and empty-host (scheme-less) rows are not
    # fetchable — the SAME rule streaming.url_frontier_stream applies,
    # so batch backfill and the streaming front-end fetch identical
    # sets (batch/stream divergence here was a review catch)
    fetchable = F.col("url_canon").isNotNull() & (F.col("host") != "")
    cand = norm.filter(~F.col("is_dup")).filter(fetchable)

    if args.blocklist:
        rules = spark.read.parquet(args.blocklist)
        verdicts = textops.url_filter(
            cand.select("doc_id", F.col("url_canon").alias("url")), rules
        )
        cand = cand.join(
            verdicts.select("doc_id", "denied", "rule_id"), "doc_id"
        )
    else:
        cand = cand.withColumn("denied", F.lit(False)).withColumn(
            "rule_id", F.lit(None).cast("long")
        )

    if args.robots:
        # politeness runs on the canonical keeper like the blocklist
        # (same host/path the fetcher would present); a disallowed
        # group's duplicates inherit the verdict via keeper_id below
        rrules = textops.robots_parse(spark.read.parquet(args.robots))
        rv = textops.robots_filter(
            cand.select("doc_id", F.col("url_canon").alias("url")),
            rrules,
            args.agent or textops.ROBOTS_AGENT,
        )
        cand = cand.join(
            rv.select(
                "doc_id", F.col("allowed").alias("robots_allowed")
            ),
            "doc_id",
        )
    else:
        cand = cand.withColumn("robots_allowed", F.lit(True))

    if args.keep_denied:
        # verdicts are computed once per canonical group (on the
        # keeper) and propagated to EVERY member via keeper_id — a
        # duplicate of a denied URL is denied too (review catch: the
        # old doc_id join marked dups of denied groups denied=false
        # and undercounted the stat). `fetchable` distinguishes
        # allowed from not-fetchable-at-all.
        out = norm.join(
            cand.select(
                F.col("doc_id").alias("keeper_id"), "denied", "rule_id",
                "robots_allowed",
            ),
            "keeper_id",
            "left",
        ).select(
            "doc_id", "url_canon", "host", "is_dup", "keeper_id",
            fetchable.alias("fetchable"),
            F.coalesce("denied", F.lit(False)).alias("denied"), "rule_id",
            # unfetchable rows never reached the robots check; they
            # report allowed=true and fetchable=false (the fetchable
            # column is the gate, robots_allowed the politeness signal)
            F.coalesce("robots_allowed", F.lit(True)).alias(
                "robots_allowed"
            ),
        )
    else:
        kept = cand.filter(~F.col("denied") & F.col("robots_allowed"))
        if args.politeness_window is not None:
            # per-host fetch budget from the effective Crawl-delay:
            # floor(3600*H / delay). Hosts with no applicable delay
            # (or an explicit delay 0) stay uncapped; a delay longer
            # than the whole window defers the host (cap 0). The cap
            # itself is the variable-budget salted rank — no
            # single-task sort on a viral host.
            delays = textops.robots_crawl_delay(
                spark.read.parquet(args.robots),
                agent=args.agent or textops.ROBOTS_AGENT,
            )
            budgets = delays.filter(F.col("crawl_delay_s") > 0).select(
                F.col("host").alias("source"),
                F.floor(
                    F.lit(3600.0 * args.politeness_window)
                    / F.col("crawl_delay_s")
                ).alias("cap_n"),
            )
            kept_b = textops.domain_cap_budgets(
                kept.select("doc_id", F.col("host").alias("source")),
                budgets,
            )
            kept = kept.join(kept_b.select("doc_id"), "doc_id")
        if args.per_host_cap:
            # domain_cap returns only the surviving rows (salted
            # two-phase rank; a mega-host never sorts in one task)
            capped = textops.domain_cap(
                kept.select("doc_id", F.col("host").alias("source")),
                cap=args.per_host_cap,
            )
            kept = kept.join(capped.select("doc_id"), "doc_id")
        out = kept.select("doc_id", "url_canon", "host")

    out.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    n_out = written.count()
    stats = {"urls_in": n_in, "rows_out": n_out}
    if args.discover_sitemaps:
        stats["sitemap_files_discovered"] = n_sitemap_files
    if args.keep_denied:
        stats["denied"] = written.filter("denied").count()
        stats["dups"] = written.filter("is_dup").count()
        if args.robots:
            stats["robots_blocked"] = written.filter(
                "NOT robots_allowed").count()
    print(json.dumps(stats))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
