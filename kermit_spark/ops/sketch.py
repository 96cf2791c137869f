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

Both are built as plain aggregations over an md5-derived hash family — the
engine's portable-hash discipline — so sketch CONTENTS are bit-identical
across engines, partition counts, and merge orders (a sketch built on the
daily increment unions with the historical sketch by simple max/sum).
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
