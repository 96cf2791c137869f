"""Benchmark harness (driver contract + scaling evidence).

Default mode: runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-workload sec...}, "sf": <sf>,
   "urls_per_sec": <crawl throughput>}

Workloads:
  * crawl_waves     — full engine: seed → 3 waves over a generated skewed
                      corpus (robots, politeness dequeue, fetch join, span
                      parse, Bloom dedup, snapshot commits)
  * frontier_dedup  — schedule() microbench: merge a candidate batch with 50%
                      overlap into a pre-built frontier (Bloom prefilter +
                      anti-join + partition-pruned commit)
  * q_*             — the oracle-checked operator queries from __spark_entry__

--scaling mode (north_rule N vs 4N evidence, sandbox variant): re-runs the
crawl workload in fresh subprocesses at local[N] and local[4N] on the SAME
generated input and reports both throughputs + scaling efficiency
(eff = T_N / (4 * T_4N) where T = URLs/sec... see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _log(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _build_spark(cpus: str, shuffle_partitions: int):
    from kermit_spark.session import build_session

    spark = build_session(
        app_name="kermit-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _corpus_spec(sf: float):
    from kermit_spark.corpus import CorpusSpec

    # sf scales the page count; host count grows slowly (skew stays extreme)
    scale = max(sf / 0.1, 0.05)
    return CorpusSpec(
        n_hosts=max(8, int(48 * scale)),
        base_pages=max(40, int(2400 * scale)),
        links_per_page=4,
        media_id_space=max(50, int(300 * scale)),
    )


def bench_crawl(spark, sf: float, waves: int = 3) -> dict:
    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.corpus import build_corpus
    from kermit_spark.crawler import Crawler, CrawlConfig
    from kermit_spark.fetch import CorpusFetcher
    from kermit_spark.frontier import Limit, Politeness

    spec = _corpus_spec(sf)
    corpus = build_corpus(spark, spec).persist()
    corpus.count()  # materialize outside the timed window

    root = tempfile.mkdtemp(prefix="kermit_bench_")
    try:
        cfg = CrawlConfig(
            num_partitions=32,
            politeness=Politeness((Limit(r".*", 200),)),
            sub_salts=16,
        )
        crawler = Crawler(spark, SnapshotCatalog(spark, root), CorpusFetcher(corpus), cfg)
        # one seed per host: the measurement covers steady-state wave
        # throughput, not single-seed BFS ramp-up
        seeds = [f"http://h{h}.test/p/0.html" for h in range(spec.n_hosts)]
        crawler.seed(seeds)
        t0 = time.time()
        stats = crawler.crawl(waves)
        wall = time.time() - t0
        fetched = sum(s.n_selected for s in stats)
        discovered = sum(s.n_new_urls for s in stats)
        return {
            "sec": wall,
            "urls_fetched": fetched,
            "urls_discovered_deduped": discovered,
            "urls_per_sec": (fetched + discovered) / wall if wall > 0 else 0.0,
            "wave_sec": [round(s.wall_s, 2) for s in stats],
        }
    finally:
        corpus.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def bench_frontier_dedup(spark, sf: float) -> dict:
    from pyspark.sql import functions as F

    from kermit_spark.catalog import SnapshotCatalog
    from kermit_spark.frontier import Frontier

    n = int(10_000_000 * max(sf, 0.001))  # sf0.1 -> 1M existing URLs
    root = tempfile.mkdtemp(prefix="kermit_dedup_")
    try:
        frontier = Frontier(SnapshotCatalog(spark, root), num_partitions=32)
        base = spark.range(0, n).select(
            F.concat(
                F.lit("http://h"), F.pmod(F.col("id"), F.lit(500)).cast("string"),
                F.lit(".test/p/"), F.col("id").cast("string"), F.lit(".html"),
            ).alias("url")
        )
        frontier.init(base)
        # candidate batch: n rows, half overlap with existing
        cand = spark.range(n // 2, n + n // 2).select(
            F.concat(
                F.lit("http://h"), F.pmod(F.col("id"), F.lit(500)).cast("string"),
                F.lit(".test/p/"), F.col("id").cast("string"), F.lit(".html"),
            ).alias("url")
        )
        t0 = time.time()
        n_new = frontier.schedule(cand, wave=1)
        wall = time.time() - t0
        return {
            "sec": wall,
            "candidates": n,
            "new_scheduled": n_new,
            "urls_per_sec": n / wall if wall > 0 else 0.0,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entrymod

    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        out[name] = {"sec": round(time.time() - t0, 3), "rows": n}
        _log(f"query {name}: {out[name]['sec']}s ({n} rows)")
    return out


def run_default() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = _sf_of(sf_dir)
    spark = _build_spark(cpus, shuffle_partitions=32)
    t0 = time.time()
    _log("crawl_waves start")
    crawl = bench_crawl(spark, sf)
    _log(f"crawl_waves done {crawl['sec']:.1f}s; frontier_dedup start")
    dedup = bench_frontier_dedup(spark, sf)
    _log(f"frontier_dedup done {dedup['sec']:.1f}s; queries start")
    queries = bench_queries(spark, sf_dir)
    _log("queries done")
    total = time.time() - t0
    qsec = {f"q_{k}": v["sec"] for k, v in queries.items()}
    qsec["crawl_waves"] = round(crawl["sec"], 3)
    qsec["frontier_dedup"] = round(dedup["sec"], 3)
    result = {
        "metric": "crawl-engine wall time (3 waves + 1M-URL dedup + operator queries)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": qsec,
        "sf": sf,
        "urls_per_sec_crawl": round(crawl["urls_per_sec"], 1),
        "urls_per_sec_dedup": round(dedup["urls_per_sec"], 1),
        "detail": {"crawl": crawl, "dedup": dedup},
    }
    spark.stop()
    return result


def run_crawl_only(cpus: str) -> dict:
    """Subprocess entry for --scaling: one crawl at a fixed parallelism."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_of(sf_dir)
    spark = _build_spark(cpus, shuffle_partitions=int(cpus) * 2)
    out = bench_crawl(spark, sf)
    out.update(bench_frontier_dedup(spark, sf))
    spark.stop()
    return out


def run_scaling(n: int = 8) -> dict:
    """North-rule scaling evidence: same job, local[N] vs local[4N]."""
    results = {}
    for cpus in (n, 4 * n):
        proc = subprocess.run(
            [sys.executable, __file__, "--crawl-only", str(cpus)],
            capture_output=True, text=True, env=os.environ.copy(),
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    tp_n = results[n]["urls_per_sec"]
    tp_4n = results[4 * n]["urls_per_sec"]
    dd_n = results[n].get("urls_per_sec", 0)
    eff = tp_4n / (4 * tp_n) if tp_n else 0.0
    return {
        "metric": "scaling efficiency (crawl waves, local[N] vs local[4N])",
        "N": n,
        "throughput_N": round(tp_n, 1),
        "throughput_4N": round(tp_4n, 1),
        "speedup": round(tp_4n / tp_n, 2) if tp_n else 0,
        "efficiency": round(eff, 3),
        "detail": results,
    }


if __name__ == "__main__":
    if "--crawl-only" in sys.argv:
        cpus = sys.argv[sys.argv.index("--crawl-only") + 1]
        print(json.dumps(run_crawl_only(cpus)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_default()))
