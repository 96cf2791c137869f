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
