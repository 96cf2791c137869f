"""spark-submit entry point for a crawl run.

The north rule requires runs "launched via spark-submit --py-files on
multi-executor clusters"; this is that driver. Typical cluster launch:

    python scripts/package.py dist/kermit_spark.zip
    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dist/kermit_spark.zip \\
        scripts/submit_crawl.py \\
        --catalog hdfs:///crawl/cat --seeds http://example.test/ \\
        --max-waves 50 --budget 100 --num-partitions 4096

Sandbox integration test (tests/test_submit.py) drives the same command
with ``--master local[4]`` from a NEUTRAL cwd, so every ``kermit_spark``
import must resolve from the zip — proving the --py-files artifact is
self-contained.

Fetch modes:
  --corpus PATH   offline: resolve fetches against a parquet corpus
                  (url, status, content_type, body) — the OfflineServer
                  analog (ext.offline.coffee:48-93); used by the test.
  (default)       live HTTP via HttpFetcher (mapInPandas, stdlib urllib).

The script only wires config to library code — no crawl logic lives here.
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="kermit-spark crawl driver")
    p.add_argument("--catalog", required=True, help="snapshot-catalog root dir/URI")
    p.add_argument("--seeds", default="", help="comma-separated seed URLs")
    p.add_argument("--seeds-file", default=None, help="file with one seed URL per line")
    p.add_argument("--corpus", default=None, help="parquet corpus path -> offline fetch")
    p.add_argument("--max-waves", type=int, default=20)
    p.add_argument("--budget", type=int, default=5, help="per-host fetches per wave")
    p.add_argument("--max-concurrent", type=int, default=5)
    p.add_argument("--num-partitions", type=int, default=32)
    p.add_argument("--sub-salts", type=int, default=16)
    p.add_argument("--global-cap", type=int, default=None)
    p.add_argument("--user-agent", default="kermit-spark")
    p.add_argument("--no-robots", action="store_true")
    p.add_argument("--compact-every", type=int, default=0)
    p.add_argument("--expire-keep-last", type=int, default=0)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--resume", action="store_true",
        help="continue from the catalog's last committed wave (no seeding)",
    )
    p.add_argument(
        "--local-master", default="",
        help='override master (default "": spark-submit --master controls it)',
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher, HttpFetcher
    from kermit_spark.frontier import Limit, Politeness
    from kermit_spark.session import build_session

    spark = build_session(
        app_name="kermit-crawl",
        master=args.local_master,
        shuffle_partitions=args.shuffle_partitions or max(args.num_partitions, 32),
    )
    spark.sparkContext.setLogLevel("WARN")

    seeds = [u for u in args.seeds.split(",") if u]
    if args.seeds_file:
        with open(args.seeds_file) as f:
            seeds += [ln.strip() for ln in f if ln.strip()]
    if not seeds and not args.resume:
        print("no seeds and not --resume: nothing to do", file=sys.stderr)
        return 2

    if args.corpus:
        fetcher = CorpusFetcher(spark.read.parquet(args.corpus))
    else:
        fetcher = HttpFetcher(user_agent=args.user_agent)

    cfg = CrawlConfig(
        num_partitions=args.num_partitions,
        politeness=Politeness((Limit(r".*", args.budget, args.max_concurrent),)),
        max_waves=args.max_waves,
        global_cap=args.global_cap,
        sub_salts=args.sub_salts,
        obey_robots=not args.no_robots,
        user_agent=args.user_agent,
        compact_every=args.compact_every,
        expire_keep_last=args.expire_keep_last,
    )
    crawler = Crawler(spark, SnapshotCatalog(spark, args.catalog), fetcher, cfg)
    if not args.resume:
        crawler.seed(seeds)

    stats = crawler.crawl()
    out = {
        "waves": len(stats),
        "last_wave": crawler.last_wave,
        "fetched_ok": sum(s.n_fetched_ok for s in stats),
        "errors": sum(s.n_errors for s in stats),
        "blocked": sum(s.n_blocked for s in stats),
        "new_urls": sum(s.n_new_urls for s in stats),
        "wall_s": round(sum(s.wall_s for s in stats), 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
