"""Deterministic sampling — training-data curation primitives.

Random sampling (``F.rand``) is useless for a reproducible 100 TB pipeline:
re-runs must pick the SAME rows, an oracle must be able to verify the pick,
and resumed jobs must not re-roll. Both operators here key off an
engine-portable 48-bit hash (md5-prefix, reproducible in DuckDB exactly —
48 bits keeps the digit-sum parse inside double-exact range), so the sample
is a pure function of the data.

Scale shapes:
  * ``hash_sample`` is a stateless filter — whole-stage codegen, no shuffle,
    pushdown-friendly. Rate = num/den applies uniformly per key.
  * ``stratified_sample`` is exact top-k per stratum using the same
    two-level window trick as the frontier dequeue (frontier.py): level 1
    caps each (stratum, salt) sub-group at k so no task ever sorts a whole
    hot stratum; level 2 ranks the ≤ sub_salts×k survivors exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 12 hex digits = 48 bits: < 2^53, so the DuckDB digit-sum parse of the same
# md5 prefix is exact in double arithmetic — hash values match bit-for-bit
HASH_HEX_DIGITS = 12


def portable_hash48(key: Column) -> Column:
    """48-bit integer hash of a (stringified) key, reproducible in DuckDB as
    a digit-sum over the same md5 prefix."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, HASH_HEX_DIGITS), 16, 10
    ).cast("long")


def hash_sample(df: DataFrame, key_col: str, num: int, den: int) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose key hashes into
    the first ``num`` of ``den`` buckets (rate num/den). Same key → same
    verdict across runs, engines and cluster sizes."""
    if not (0 < num <= den):
        raise ValueError(f"need 0 < num <= den, got {num}/{den}")
    return df.filter(F.pmod(portable_hash48(F.col(key_col)), F.lit(den)) < F.lit(num))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    sub_salts: int = 16,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen deterministically
    (lowest hash first, key as tiebreak). The per-stratum pick is a uniform
    random-looking but reproducible subset — the standard way to cap a
    dominant source/domain in a training mix without losing determinism."""
    h = portable_hash48(F.col(key_col))
    df = df.withColumn("_h", h).withColumn(
        "_salt", F.pmod(F.col("_h"), F.lit(sub_salts)).cast("int")
    )
    order = [F.col("_h").asc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(strata_col, "_salt").orderBy(*order)
    df = df.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= k)
    w2 = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= k)
        .drop("_h", "_salt", "_r1", "_rank")
    )


#: hash space of portable_hash48 — bucket spans divide this
_HASH_SPACE = 1 << (4 * HASH_HEX_DIGITS)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weight_col: str,
    budget: int | DataFrame,
    num_buckets: int = 1024,
) -> DataFrame:
    """Greedy per-stratum quota sample by cumulative WEIGHT (token budget):
    walk each stratum in deterministic (hash, key) order and keep every row
    whose preceding cumulative weight is strictly below ``budget`` — the
    "mix N tokens per domain" primitive of a training-data pipeline. The
    first row of a non-empty stratum is always kept (budget > 0), and the
    row that crosses the budget is the last one kept.

    ``budget`` is a constant, or a DataFrame with (strata_col, 'budget')
    for per-domain quotas (joined; strata without a row are dropped).

    Scale shape — the naive form is a full-stratum window cumsum: one task
    sorts the WHOLE hot domain. Instead this runs two bounded passes:
      1. rows → hash-range buckets (``num_buckets`` spans of the 48-bit
         space); per-(stratum, bucket) weight mass is aggregated (map-side
         combine), then a window cumsum over ≤ num_buckets rows per stratum
         classifies each bucket: fully inside the budget, boundary, or
         fully outside.
      2. 'full' buckets keep all rows with NO sort; only the single
         boundary bucket per stratum pays an exact (hash, key) window —
         ~1/num_buckets of the stratum, so the hot-domain sort shrinks by
         the same factor.
    Every shuffle keys on (stratum, bucket); the exact window partition is
    bounded, so a 100×-skewed domain costs 100×/num_buckets, not 100×.
    Weights must be non-negative; zero-weight rows ride along (they never
    consume budget).
    """
    span = _HASH_SPACE // num_buckets + 1
    d = df.withColumn("_h", portable_hash48(F.col(key_col))).withColumn(
        "_b", (F.col("_h") / span).cast("int")
    )
    mass = d.groupBy(strata_col, "_b").agg(
        F.sum(F.col(weight_col).cast("long")).alias("_m")
    )
    wb = Window.partitionBy(strata_col).orderBy("_b")
    mass = mass.withColumn(
        "_pre", F.coalesce(F.sum("_m").over(wb) - F.col("_m"), F.lit(0).cast("long"))
    )
    if isinstance(budget, DataFrame):
        mass = mass.join(budget.select(strata_col, "budget"), strata_col)
    else:
        mass = mass.withColumn("budget", F.lit(int(budget)).cast("long"))
    # keep-prefix semantics: row kept iff (sum of weights strictly before it
    # in (hash, key) order within the stratum) < budget
    classified = mass.filter(F.col("_pre") < F.col("budget")).select(
        F.col(strata_col).alias("_cs"),
        F.col("_b").alias("_cb"),
        "_pre",
        "budget",
        # strictly inside only: a bucket ending EXACTLY at the budget takes
        # the exact pass, so trailing zero-weight rows (prefix == budget)
        # are dropped per the strict-< contract
        (F.col("_pre") + F.col("_m") < F.col("budget")).alias("_full"),
    )
    joined = d.join(
        classified,
        (d[strata_col] == F.col("_cs")) & (d["_b"] == F.col("_cb")),
    )
    full = joined.filter(F.col("_full")).drop(
        "_h", "_b", "_cs", "_cb", "_pre", "budget", "_full"
    )
    wx = Window.partitionBy(strata_col, "_b").orderBy(
        F.col("_h").asc(), F.col(key_col).asc()
    )
    boundary = (
        joined.filter(~F.col("_full"))
        .withColumn(
            "_cum_before",
            F.coalesce(
                F.sum(F.col(weight_col).cast("long")).over(wx)
                - F.col(weight_col).cast("long"),
                F.lit(0).cast("long"),
            )
            + F.col("_pre"),
        )
        .filter(F.col("_cum_before") < F.col("budget"))
        .drop("_h", "_b", "_cs", "_cb", "_pre", "budget", "_full", "_cum_before")
    )
    return full.unionByName(boundary)


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based domain rebalancing — the multilingual-LM mixing
    rule (XLM-R / mT5: sample domain d with probability ∝ n_d^alpha,
    alpha < 1 flattens the head, alpha = 1 is natural frequency): keep each
    row of stratum d with probability

        p_d = min(1, target_frac · N_total · n_d^alpha / (Σ n^alpha · n_d))

    so the expected output is ``target_frac·N_total`` rows whose per-domain
    shares follow n^alpha instead of n. The keep decision is DETERMINISTIC
    (portable 48-bit hash of the key vs p_d quantized to parts-per-million),
    so re-runs, resumes and the DuckDB oracle pick the identical rows —
    same contract as every sampler here.

    Returns the kept rows with all input columns plus ``p_ppm`` (the
    stratum's quantized keep probability, for auditability).

    Scale shape: one map-side-partial count per stratum, one single-row
    global aggregate that rides the plan as a broadcast (no driver
    collect), then a broadcast hash join of the per-stratum probability
    onto the data and a stateless codegen filter — the corpus itself is
    scanned once and never sorted or re-shuffled; a 10^9-row hot domain
    costs exactly one pass."""
    if not 0 < target_frac <= 1:
        raise ValueError(f"need 0 < target_frac <= 1, got {target_frac}")
    if alpha < 0:
        raise ValueError(f"need alpha >= 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("_n"), F.lit(alpha))).alias("_sw"),
        F.sum("_n").alias("_total"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        strata_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(target_frac)
                * F.col("_total")
                * (F.pow(F.col("_n"), F.lit(alpha)) / F.col("_sw"))
                / F.col("_n"),
            )
            * F.lit(1_000_000)
            + F.lit(0.5)
        ).cast("long").alias("p_ppm"),
    )
    return df.join(F.broadcast(probs), strata_col).filter(
        F.pmod(portable_hash48(F.col(key_col)), F.lit(1_000_000)) < F.col("p_ppm")
    )
