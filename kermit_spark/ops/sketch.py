"""Mergeable frequency/cardinality sketches — the sub-linear structures a
10^10-URL frontier plans with when exact groupBy state is too big:

  Count-Min     (Cormode & Muthukrishnan 2005) — per-key frequency
                estimates (hot-host detection, politeness planning) from a
                depth×width counter grid that is orders of magnitude smaller
                than the key space. Overestimates only; error ≤ N·e/width
                with probability 1-e^-depth.
  HyperLogLog   (Flajolet et al. 2007) — distinct-count estimates (unique
                URLs per host/day without an exact distinct) from m
                max-leading-zero registers.
  HDR histogram (Gil Tene's HdrHistogram bucketing; the integer-exact
                cousin of DDSketch, Masson et al. VLDB 2019) — quantile
                estimates over non-negative integers (p50/p99 fetch
                latency per fleet/host) from log2-octave × linear
                sub-bucket cells with bounded RELATIVE error 2^-sub_bits.
                Merge = union + sum; cell count is bounded by
                octaves·2^(sub_bits+1) regardless of input size.

All are built as plain aggregations — CMS/HLL over an md5-derived hash
family (the engine's portable-hash discipline), HDR over pure integer bit
algebra — so sketch CONTENTS are bit-identical across engines, partition
counts, and merge orders (a sketch built on the daily increment unions
with the historical sketch by simple max/sum).
Everything is JVM codegen: no UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hex_val(expr: str) -> str:
    """SQL for the integer value of ONE lowercase hex digit column expr."""
    return f"cast(conv({expr}, 16, 10) as int)"


def cms_build(
    df: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width_digits: int = 3,
) -> DataFrame:
    """Build the sparse Count-Min grid: (row, col, n) — one hash-agg over
    depth×|input| cells; cells never touched are implicit zeros. Merge two
    sketches with union + groupBy sum; the grid is depth × 16^width_digits
    counters regardless of how many distinct keys exist."""
    cells = df.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), r -> "
                f"cast(conv(substring(md5(concat(cast(r as string), ':', {key_col})), "
                f"1, {width_digits}), 16, 10) as int))"
            )
        ).alias("row", "col")
    )
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width_digits: int = 3,
) -> DataFrame:
    """Point-estimate each key's frequency: min over rows of its cell
    counts (absent cell = 0). The probe set is usually small (suspected hot
    hosts) — it explodes to depth rows per key and joins the grid on
    (row, col), a broadcast-sized equi-join."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), r -> "
                f"cast(conv(substring(md5(concat(cast(r as string), ':', {key_col})), "
                f"1, {width_digits}), 16, 10) as int))"
            )
        ).alias("row", "col"),
    )
    return (
        probes.join(cms, ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def hll_registers(
    df: DataFrame,
    key_col: str = "key",
    bucket_digits: int = 2,
    rho_digits: int = 12,
) -> DataFrame:
    """HyperLogLog register table: (bucket, max_rho) over
    m = 16^bucket_digits buckets. rho = 1 + leading zero BITS of the
    ``rho_digits`` hex digits following the bucket prefix of md5(key) —
    computed digit-wise (first non-zero hex digit position + its intra-digit
    leading zeros), pure integer codegen. Untouched buckets are implicit
    (rho 0); merge sketches with union + groupBy max."""
    h = f"md5({key_col})"
    digit = f"substring({h}, {bucket_digits} + 1 + p, 1)"
    # position p of the first non-zero hex digit (0-based), rho_digits when
    # all zero; filter+array_min keeps it one pass
    first_nz = (
        f"coalesce(array_min(filter(transform(sequence(0, {rho_digits - 1}), "
        f"p -> if({_hex_val(digit)} > 0, p, cast(null as int))), x -> x is not null)), "
        f"{rho_digits})"
    )
    v_at = (
        f"cast(conv(substring(_h, {bucket_digits} + 1 + _p, 1), 16, 10) as int)"
    )
    intra = f"(CASE WHEN {v_at} >= 8 THEN 0 WHEN {v_at} >= 4 THEN 1 WHEN {v_at} >= 2 THEN 2 ELSE 3 END)"
    rho = (
        f"CASE WHEN _p = {rho_digits} THEN {4 * rho_digits} + 1 "
        f"ELSE 4 * _p + {intra} + 1 END"
    )
    rows = df.select(
        F.expr(
            f"cast(conv(substring({h}, 1, {bucket_digits}), 16, 10) as int)"
        ).alias("bucket"),
        F.expr(first_nz).alias("_p"),
        F.expr(h).alias("_h"),
    ).select("bucket", F.expr(rho).alias("rho"))
    return rows.groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, bucket_digits: int = 2) -> float:
    """Cardinality estimate from the register table (driver-side float —
    the registers are the portable, oracle-able artifact; the estimate is
    one harmonic-mean formula over ≤ m rows): alpha_m·m²/Σ2^-rho with the
    small-range linear-counting correction (Flajolet §4)."""
    import math

    m = 16 ** bucket_digits
    regs = {r["bucket"]: r["max_rho"] for r in registers.collect()}
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    zeros = m - len(regs)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


#: HDR cell geometry shared by the Spark ops and the generated DuckDB
#: oracle: values below 2^(sub_bits+1) are stored exactly (shift 0); each
#: further octave halves into 2^sub_bits linear sub-buckets, so the cell a
#: value lands in is at most a factor (1 + 2^-sub_bits) wide.
HDR_SUB_BITS = 5
#: Octave thresholds: shift(v) = |{t in HDR_THRESHOLDS : v >= t}|. The top
#: threshold is 2^62 so shifted values stay in signed-64 range; values at
#: or above it share the coarsest octave (still counted, just wider cells).
HDR_THRESHOLDS = tuple(
    1 << k for k in range(HDR_SUB_BITS + 1, 63)
)


def _hdr_shift(value_expr: str) -> str:
    """SQL (valid in BOTH Spark and DuckDB) for the octave shift of one
    non-negative integer expression: the count of thresholds <= value,
    generated as an exact integer comparison cascade (no log/ln — the
    transcendental would differ in the last ulp between engines)."""
    return (
        "(CASE "
        + " ".join(
            f"WHEN {value_expr} >= {t} THEN {len(HDR_THRESHOLDS) - i}"
            for i, t in enumerate(reversed(HDR_THRESHOLDS))
        )
        + " ELSE 0 END)"
    )


def hdr_build(
    df: DataFrame,
    value_col: str = "value",
    sub_bits: int = HDR_SUB_BITS,
) -> DataFrame:
    """Build the HDR cell table (shift, sub, n) over a non-negative
    integer column — NULLs and negatives are excluded (HdrHistogram
    semantics: the sketch covers [0, 2^63); callers wanting to track
    rejects count them separately, one cheap aggregate).

    A value lands in cell (shift, sub = value >> shift) whose lower bound
    ``sub << shift`` underestimates it by < 2^shift <= value·2^-sub_bits —
    the bounded-relative-error contract. Merge two sketches with
    union + groupBy(shift, sub) sum(n).

    Scale shape: one hash-agg over at most
    (len(HDR_THRESHOLDS)+1)·2^(sub_bits+1) ≈ 3.7k cells (sub_bits=5) no
    matter how many trillion rows went in; map-side partial aggregation
    does almost all the work, the shuffle moves only cells. Pure integer
    JVM codegen — no log(), no UDF."""
    if sub_bits != HDR_SUB_BITS:
        raise ValueError(
            f"sub_bits is pinned to {HDR_SUB_BITS} so the generated oracle "
            f"and the threshold table stay in lockstep; got {sub_bits}"
        )
    v = f"cast({value_col} as bigint)"
    return (
        df.where(F.expr(f"{v} is not null and {v} >= 0"))
        .select(
            F.expr(_hdr_shift(v)).alias("shift"),
            F.expr(f"shiftright({v}, {_hdr_shift(v)})").alias("sub"),
        )
        .groupBy("shift", "sub")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hdr_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two HDR sketches: cells add. Associative and commutative, so
    per-day / per-partition sketches fold in any order."""
    return (
        a.unionByName(b)
        .groupBy("shift", "sub")
        .agg(F.sum("n").alias("n"))
    )


def hdr_quantiles(sketch: DataFrame, qs_ppm: tuple[int, ...]) -> DataFrame:
    """Nearest-rank quantile estimates from an HDR cell table: for each
    q (parts-per-million), rank = 1 + (q·(N-1)) div 10^6 over the N
    sketched values, and the estimate is the LOWER BOUND ``sub << shift``
    of the first cell whose cumulative count reaches the rank — an
    underestimate by < est·2^-sub_bits (exact when shift = 0, i.e. any
    value < 2^(sub_bits+1)). Returns (q_ppm, est) rows; empty sketch →
    empty result. All integer arithmetic, bit-identical across engines.

    Plan note: the running-count window is partitionless BY DESIGN — it
    orders the SKETCH (≤ ~3.7k bounded cells, see hdr_build), never the
    data, so the single-partition sort is O(1) in input size; the
    rank-probe is a broadcast theta-join against the same bounded cells."""
    from pyspark.sql import Window

    if not qs_ppm:
        raise ValueError("qs_ppm must be non-empty")
    bad = [q for q in qs_ppm if not (0 <= int(q) <= 1_000_000)]
    if bad:
        raise ValueError(f"q_ppm values must be in [0, 1000000]; got {bad}")
    w = Window.orderBy("rep").rowsBetween(Window.unboundedPreceding, 0)
    cells = sketch.select(
        F.expr("shiftleft(sub, shift)").alias("rep"), F.col("n")
    ).select("rep", F.sum("n").over(w).alias("cum"))
    total = sketch.agg(F.sum("n").alias("n_total"))
    spark = sketch.sparkSession
    qdf = spark.createDataFrame(
        [(int(q),) for q in qs_ppm], "q_ppm bigint"
    )
    ranks = qdf.crossJoin(F.broadcast(total)).select(
        "q_ppm",
        (F.lit(1) + F.expr("div(q_ppm * (n_total - 1), 1000000)")).alias("rank"),
    )
    return (
        ranks.join(F.broadcast(cells), F.col("cum") >= F.col("rank"))
        .groupBy("q_ppm")
        .agg(F.min("rep").alias("est"))
    )


#: Size of the portable 48-bit hash space the KMV sketch draws from (the
#: engine's md5-prefix family — the same 12-hex-digit convention as
#: ops.text.hashed_linear_score). 48 bits keep (k-1)·P exact in signed-64
#: integer arithmetic for any practical k.
KMV_P48 = 1 << 48


def _h48(key_col: str) -> "F.Column":
    """Portable 48-bit hash of a string column: the first 12 hex digits of
    md5, parsed to BIGINT — bit-identical in Spark (`conv`) and DuckDB
    (`('0x'||…)::BIGINT`)."""
    return F.expr(
        f"cast(conv(substring(md5({key_col}), 1, 12), 16, 10) as bigint)"
    )


def kmv_build(
    df: DataFrame,
    group_col: str = "group",
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """Per-group KMV (bottom-k / k-minimum-values) sketch (Bar-Yossef et
    al. RANDOM 2002; Beyer et al. SIGMOD 2007): the k smallest portable
    48-bit hashes of the group's distinct keys, as a sorted
    ``array<bigint>``. One sketch summarizes a host's content set in
    ≤ k·8 bytes and supports distinct-count estimates AND — unlike
    HyperLogLog — set-overlap estimates between groups (mirror-host
    detection, crawl-overlap audits), because the hashes themselves are a
    uniform coordinated sample of the key space.

    Merge law: the sketch of A ∪ B is the bottom-k of the union of the two
    sketches' hash sets (see :func:`kmv_union`) — build on the daily
    increment, merge with the historical sketch.

    Scale shape: one hash-shuffle on (group, 16-byte hash) for the
    distinct, then a per-group bottom-k window on the SAME partitioning
    (Catalyst reuses the exchange); state per group after the window is
    ≤ k hashes. At 10^10 keys pre-filter ``h < threshold`` ahead of the
    distinct when group sizes are known (keeps shuffle rows ∝ k, the
    standard KMV trick) — the threshold is a correctness no-op whenever
    every group's kth hash stays below it.

    Returns (group, hashes) with hashes ascending, length ≤ k."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2; got {k}")
    hashed = df.select(
        F.col(group_col).alias("group"), _h48(key_col).alias("h")
    ).distinct()
    w = Window.partitionBy("group").orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("group")
        .agg(F.sort_array(F.collect_list("h")).alias("hashes"))
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two KMV sketch tables (same ``k``): per group, bottom-k of the
    union of hash sets — exactly the sketch :func:`kmv_build` would produce
    on the concatenated inputs. Groups present in only one side pass
    through. Pure array algebra after an outer join on group: no explode,
    no window."""
    merged = a.selectExpr("group", "hashes as _ha").join(
        b.selectExpr("group", "hashes as _hb"), "group", "full_outer"
    )
    u = F.array_sort(
        F.array_union(
            F.coalesce(F.col("_ha"), F.array().cast("array<bigint>")),
            F.coalesce(F.col("_hb"), F.array().cast("array<bigint>")),
        )
    )
    return merged.select(
        "group",
        F.slice(u, 1, F.least(F.size(u), F.lit(k))).alias("hashes"),
    )


def kmv_distinct_estimate(sk: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from the KMV sketch: exact
    ``n_hashes`` when the group never filled the sketch, else the
    unbiased KMV estimator (k-1)·P/h_k over the 48-bit hash space —
    INTEGER division only (no doubles: (k-1)·2^48 ≤ 2^58 would round in a
    53-bit mantissa), so the estimate is bit-identical across engines.
    Relative error ~ 1/sqrt(k-2)."""
    n = F.size("hashes").cast("long")
    est = F.when(n < k, n).otherwise(
        F.expr(f"div({(k - 1)} * cast({KMV_P48} as bigint), "
               f"greatest(element_at(hashes, {k}), cast(1 as bigint)))")
    )
    return sk.select("group", n.alias("n_hashes"), est.cast("long").alias("est_distinct"))


def kmv_pair_jaccard(
    sk: DataFrame,
    k: int = 64,
    min_shared: int = 2,
    max_bucket: int = 50,
) -> DataFrame:
    """Mirror detection (Bharat & Broder WWW 1999) over KMV sketches:
    candidate group pairs that share hash samples, with the coordinated-
    sample Jaccard estimate J ≈ |S ∩ A ∩ B| / |S| where S is the bottom-k
    of A ∪ B (Beyer et al. 2007 — the hashes are the SAME uniform sample
    on both sides, so membership overlap in S estimates the true Jaccard).

    Candidate generation is the LSH shape, never all-pairs: explode each
    group's ≤ k hashes, cap each hash's bucket at ``max_bucket`` lowest
    groups (a hash shared by B groups — boilerplate content — would yield
    B² pairs; the cap bounds it, same discipline as minhash/simhash/
    embedding buckets), equi-join on the hash, keep pairs sharing ≥
    ``min_shared`` sampled hashes. The estimator then joins the two ≤ k
    sketch arrays back and runs pure array algebra.

    Returns (group_a, group_b, shared_k, union_k, jaccard_ppm) with
    group_a < group_b; jaccard_ppm = floor(shared·10⁶/union_k)."""
    from pyspark.sql import Window

    if min_shared < 1 or max_bucket < 2:
        raise ValueError(
            f"need min_shared >= 1 and max_bucket >= 2; got {min_shared}, {max_bucket}"
        )
    ex = sk.select("group", F.explode("hashes").alias("h"))
    w = Window.partitionBy("h").orderBy("group")
    capped = (
        ex.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
    )
    pairs = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.group") < F.col("b.group")),
        )
        .groupBy(
            F.col("a.group").alias("group_a"), F.col("b.group").alias("group_b")
        )
        .agg(F.count(F.lit(1)).alias("_shared_raw"))
        .filter(F.col("_shared_raw") >= min_shared)
    )
    est = (
        pairs.join(sk.selectExpr("group as group_a", "hashes as _ha"), "group_a")
        .join(sk.selectExpr("group as group_b", "hashes as _hb"), "group_b")
    )
    u = F.array_sort(F.array_union(F.col("_ha"), F.col("_hb")))
    kk = F.least(F.size(u), F.lit(k))
    s = F.slice(u, 1, kk)
    shared_k = F.size(
        F.array_intersect(s, F.array_intersect(F.col("_ha"), F.col("_hb")))
    ).cast("long")
    return est.select(
        "group_a",
        "group_b",
        shared_k.alias("shared_k"),
        kk.cast("long").alias("union_k"),
        F.floor(shared_k * F.lit(1_000_000) / kk).alias("jaccard_ppm"),
    )
