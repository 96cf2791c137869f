"""SparkSession factory with scale-appropriate defaults.

Defaults chosen for the crawl workload: AQE on (skew-join splitting for
hot hosts), adaptive shuffle-partition coalescing, Arrow enabled for the
vectorized pandas UDF surface (input_hint mandates no per-row Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "kermit-spark",
    master: str | None = None,
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
    adaptive: bool = True,
) -> SparkSession:
    """Build a SparkSession tuned for the crawl engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (sandbox). Pass
    ``master=""`` to leave the master UNSET so spark-submit controls
    deployment (``--master yarn|k8s://…|spark://…``) — scripts/submit_crawl.py
    uses this; the sandbox integration test drives it through a real
    ``spark-submit --py-files kermit_spark.zip`` invocation.

    ``adaptive``: AQE on (default) for production posture — skew-join
    splitting and partition coalescing pay for themselves at real wave
    sizes. At sandbox data sizes AQE's per-exchange re-planning barrier
    DOMINATES wave latency (measured 2-3x wave wall time on ~25k-URL
    waves), so benchmarks pass ``adaptive=False``; correctness is identical
    (the engine handles skew structurally: two-level dequeue + host-salt
    partitioning, not via AQE).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    aqe = "true" if adaptive else "false"
    b = SparkSession.builder.appName(app_name)
    if master:  # "" = spark-submit owns --master/--deploy-mode
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch slicing for pandas UDFs. The default (10000 rows) is
        # pathological for wide rows: ~10 kB bodies make ~100 MB batches per
        # task, and 16+ concurrent tasks churn gigabytes of off-heap Arrow
        # allocations (same many-core page-fault/TLB class of problem as the
        # transferTo note below). Order-shuffled interleaved sweep on the
        # span-parse leg (60k docs, local[16], 4 trials each position):
        # 10000 -> 10.1-14.4 s in EVERY position; 512 -> 2.0-3.2 s
        # post-warmup; 64 -> 1.8-2.4 s. 512 keeps batches ~5 MB for 10 kB
        # bodies while amortizing per-batch overhead for narrow rows.
        # (spark.sql.execution.arrow.maxBytesPerBatch would be the
        # width-independent knob but only applies to transformWithState
        # serializers in Spark 4.1, not scalar pandas UDFs.)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        # crawl tables are small-file-heavy at test scale; keep scans cheap
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("KERMIT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # file-to-file FileChannel.transferTo (shuffle-file concat in the
        # bypass-merge writer, spill merges) maps+unmaps chunks of the source
        # file; every munmap broadcasts TLB-shootdown IPIs to all cores. On a
        # many-core single host this degrades whole-job wall time 5-10x once
        # shuffle files accumulate (measured: 23s -> 175s on the 1M-URL dedup
        # microbench, sys CPU 60-90%, threads pinned in map0/unmap0 from
        # transferToTrustedChannel). Buffered stream copy avoids mmap
        # entirely and is equally fast at these block sizes.
        .config("spark.file.transferTo", "false")
        # one serialized output file per map task (UnsafeShuffleWriter)
        # instead of the bypass writer's per-reduce-partition files + concat:
        # fewer files, no concatenation step at all for unspilled tasks.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
