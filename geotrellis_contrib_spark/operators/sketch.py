"""Streaming-sketch primitives of a 100 TB pipeline: HyperLogLog
distinct counts (Flajolet et al. 2007), count-min frequency sketches
(Cormode & Muthukrishnan 2005) and Bloom membership filters
(Bloom 1970). All three share the shape that makes them the scale
path: the state is CONSTANT-SIZE per group (2^p registers / d·w
counters / m bits) and merges elementwise (MAX / + / OR), so
per-source/day sketches compose across partitions, files and days
for free — where the exact versions (COUNT DISTINCT, per-token
counts, membership joins) each cost a full shuffle of every key.

Oracle discipline: every step is INTEGER arithmetic emitted by shared
generators with per-dialect operator formatters (the morton/geohash
pattern — `^` is XOR in Spark but EXPONENT in DuckDB, whose XOR is the
`xor()` function):

  * hash: the Murmur3 32-bit finalizer (xor-shift / multiply twice) —
    REAL avalanche. Affine/multiplicative-only mixes were tried and
    rejected: sequential ids map to low-discrepancy sequences whose
    max-order statistics bias HLL by 20-60% (three-distance theorem);
    the finalizer holds worst-case error to ~4% at m=512 across
    sequential, strided and random id sets (pytest-pinned).
    32×32-bit products are DECOMPOSED (lo·K + ((hi·K) mod 2^16)·2^16)
    so nothing exceeds int64 in either engine.
  * register = top p of the 31-bit hash (floor-division), rho =
    leading-zero count of the rest + 1 via a generated comparison CASE
    chain — libm-free.
  * sketch state = per-(group, register) MAX(rho); the gate compares
    the STATE exactly. Estimation (driver/test side,
    :func:`estimate`) applies the published linear-counting
    small-range correction."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M32 = 1 << 32

XOR_SPARK = lambda a, b: f"({a} ^ {b})"                  # noqa: E731
RSH_SPARK = lambda a, n: f"shiftright({a}, {n})"         # noqa: E731
XOR_DUCKDB = lambda a, b: f"xor({a}, {b})"               # noqa: E731
RSH_DUCKDB = lambda a, n: f"({a} >> {n})"                # noqa: E731


def _mul32(h: str, k: int) -> str:
    """(h · k) mod 2^32 with both partial products inside int64.

    The result is CAST back to BIGINT because DuckDB's FLOOR returns
    DOUBLE and its xor()/>> are integer-only (Spark's FLOOR is already
    BIGINT — the cast is a no-op there). Every intermediate is an
    exact integer < 2^48, far under the 2^53 double mantissa, so the
    round-to-nearest cast is value-exact."""
    return (f"CAST(((({h}) % 65536) * {k}"
            f" + ((FLOOR(({h}) / 65536) * {k}) % 65536) * 65536)"
            f" % {_M32} AS BIGINT)")


def sql_hash31(id_expr: str, xor, rsh) -> str:
    """Murmur3 fmix32 of the (non-negative) id, top 31 bits."""
    h = f"(({id_expr}) % {_M32})"
    h = _mul32(xor(h, rsh(h, 16)), 0x85EBCA6B)
    h = f"({h})"
    h = _mul32(xor(h, rsh(h, 13)), 0xC2B2AE35)
    h = f"({h})"
    h = xor(h, rsh(h, 16))
    return f"FLOOR(({h}) / 2)"


def sql_rho(w: str, bits: int) -> str:
    """Leading-zero count of the ``bits``-wide integer ``w`` plus 1 —
    a pure comparison CASE chain (w == 0 -> bits + 1)."""
    arms = " ".join(
        f"WHEN ({w}) >= {1 << (bits - k)} THEN {k}"
        for k in range(1, bits + 1))
    return f"(CASE {arms} ELSE {bits + 1} END)"


def hll_state(df: DataFrame, id_col: str, group_col: str,
              p: int = 9) -> DataFrame:
    """Per-group sketch state: (g, register, rho) with rho the
    per-register MAX. Registers never observed are absent (the merge
    identity) — :func:`estimate` treats them as zeros. Two-step
    projection: the hash lands in a named column once; register/rho
    derive from it (the geohash codegen lesson)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be 4..16: {p}")
    wbits = 31 - p
    hashed = df.select(
        F.col(group_col).alias("g"),
        F.expr(sql_hash31(id_col, XOR_SPARK, RSH_SPARK))
         .cast("long").alias("_h"))
    return (hashed.select(
        "g",
        F.expr(f"CAST(FLOOR(_h / {float(1 << wbits)!r}) AS INT)")
         .alias("register"),
        F.expr(sql_rho(f"(_h % {1 << wbits})", wbits))
         .cast("int").alias("rho"))
        .groupBy("g", "register").agg(F.max("rho").alias("rho")))


def sql_hll_state_duckdb(src: str, id_expr: str, group_expr: str,
                         p: int = 9) -> str:
    """The oracle twin: full state query text over relation ``src``."""
    wbits = 31 - p
    h = sql_hash31(id_expr, XOR_DUCKDB, RSH_DUCKDB)
    return (f"SELECT {group_expr} AS g, "
            f"CAST(FLOOR(_h / {float(1 << wbits)!r}) AS INT) AS register, "
            f"CAST(MAX({sql_rho(f'(_h % {1 << wbits})', wbits)}) AS INT)"
            f" AS rho "
            f"FROM (SELECT {group_expr}, CAST({h} AS BIGINT) AS _h"
            f" FROM {src}) _hs GROUP BY 1, 2")


# golden-ratio seed stride: hash row j hashes (x + j·CM_SEED) through
# the SAME fmix32 — avalanche makes the d rows effectively independent
CM_SEED = 2654435769


def _row_hash(base: str, j: int, xor, rsh) -> str:
    return sql_hash31(f"(({base}) + {j * CM_SEED})", xor, rsh)


def cm_state(df: DataFrame, text_col: str, group_col: str,
             d: int = 4, w: int = 256) -> DataFrame:
    """Per-group count-min state: (g, hrow, bucket, cnt) with cnt the
    number of token OCCURRENCES hashing to that counter. Tokens are
    whitespace-split non-empty words hashed with the engine-owned
    polynomial char fold (the dedup discipline — never Spark-internal
    hashes, so the DuckDB oracle recomputes them exactly), then each
    of the d rows re-mixes (token_hash + j·CM_SEED) through fmix32.
    Scale shape: token explode -> map-side partial agg bounds the
    shuffle by d·w·groups, not by token count."""
    from geotrellis_contrib_spark.operators.dedup import _char_hash
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2: {d}, {w}")
    toks = (df.select(F.col(group_col).alias("g"),
                      F.explode(F.split(F.col(text_col), " ")).alias("tok"))
              .filter(F.length("tok") > 0))
    hashed = toks.select("g", _char_hash(F.col("tok")).alias("_th"))
    buckets = hashed.select("g", *[
        F.expr(f"CAST(({_row_hash('_th', j, XOR_SPARK, RSH_SPARK)})"
               f" % {w} AS INT)").alias(f"_b{j}")
        for j in range(d)])
    pairs = buckets.select("g", F.explode(F.array(*[
        F.struct(F.lit(j).cast("int").alias("hrow"),
                 F.col(f"_b{j}").alias("bucket"))
        for j in range(d)])).alias("rb"))
    return (pairs.select("g", "rb.hrow", "rb.bucket")
            .groupBy("g", "hrow", "bucket")
            .agg(F.count("*").alias("cnt")))


def _char_hash_duckdb(tok: str) -> str:
    from geotrellis_contrib_spark.functions.text import FP_BASE, FP_MOD
    return (f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), "
            f"[CAST(ASCII(c) AS BIGINT) for c in STRING_SPLIT({tok}, '')]), "
            f"(acc, ch) -> (acc * {FP_BASE} + ch) % {FP_MOD})")


def sql_cm_state_duckdb(src: str, text_expr: str, group_expr: str,
                        d: int = 4, w: int = 256) -> str:
    """The oracle twin of :func:`cm_state` over relation ``src``."""
    arms = " ".join(
        f"WHEN {j} THEN {_row_hash('th', j, XOR_DUCKDB, RSH_DUCKDB)}"
        for j in range(d))
    return (
        f"WITH _cm_toks AS ("
        f"  SELECT g, {_char_hash_duckdb('tok')} AS th FROM ("
        f"    SELECT {group_expr} AS g,"
        f"           UNNEST(STRING_SPLIT({text_expr}, ' ')) AS tok"
        f"    FROM {src}) s WHERE LEN(tok) > 0) "
        f"SELECT g, CAST(k AS INT) AS hrow,"
        f"       CAST((CASE k {arms} END) % {w} AS INT) AS bucket,"
        f"       CAST(COUNT(*) AS BIGINT) AS cnt"
        f" FROM _cm_toks, range(0, {d}) t(k)"
        f" GROUP BY 1, 2, 3")


def cm_estimate(state_rows, token_hash: int, d: int = 4,
                w: int = 256) -> int:
    """Point-frequency estimate: MIN over rows of the addressed
    counter (count-min never underestimates; overestimates are
    bounded by e·N/w with prob 1 - e^-d). Test/driver side."""
    counters = {(r, b): c for r, b, c in state_rows}
    return min(counters.get((j, _py_hash31(token_hash + j * CM_SEED) % w),
                            0)
               for j in range(d))


def _py_hash31(i: int) -> int:
    h = i % _M32
    h ^= h >> 16
    h = (h * 0x85EBCA6B) % _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) % _M32
    h ^= h >> 16
    return h >> 1


def bloom_state(df: DataFrame, id_col: str, group_col: str,
                m: int = 4096, k: int = 3) -> DataFrame:
    """Per-group Bloom filter state: the DISTINCT set bit positions
    (g, bit). Bit j of element x is fmix32(x + j·CM_SEED) mod m. The
    state is the canonical sparse encoding of the m-bit array; it
    merges by union (bitwise OR). No false negatives by construction;
    false-positive rate ~ (1 - e^{-kn/m})^k."""
    if m < 2 or k < 1:
        raise ValueError(f"need m >= 2, k >= 1: {m}, {k}")
    ids = df.select(F.col(group_col).alias("g"), F.col(id_col).alias("_x"))
    return ids.select("g", F.explode(F.array(*[
        F.expr(f"CAST(({_row_hash('_x', j, XOR_SPARK, RSH_SPARK)})"
               f" % {m} AS INT)")
        for j in range(k)])).alias("bit")).distinct()


def sql_bloom_state_duckdb(src: str, id_expr: str, group_expr: str,
                           m: int = 4096, k: int = 3) -> str:
    """The oracle twin of :func:`bloom_state` over relation ``src``."""
    arms = " ".join(
        f"WHEN {j} THEN {_row_hash('x', j, XOR_DUCKDB, RSH_DUCKDB)}"
        for j in range(k))
    return (
        f"SELECT DISTINCT g,"
        f" CAST((CASE j {arms} END) % {m} AS INT) AS bit"
        f" FROM (SELECT {group_expr} AS g, {id_expr} AS x FROM {src}) s,"
        f" range(0, {k}) t(j)")


def estimate(state_rows, p: int = 9) -> float:
    """Driver/test-side HLL estimate from (register, rho) pairs —
    alpha_m · m² / (Σ 2^-rho + zeros), with linear counting below
    2.5·m (the published small-range correction)."""
    m = 1 << p
    regs = {}
    for reg, rho in state_rows:
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    s = zeros * 1.0 + sum(2.0 ** -r for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e
