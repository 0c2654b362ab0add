"""Hilbert curve index: bijectivity + unit-step adjacency (the property
Morton lacks), corner goldens, DuckDB stage-chain parity, and the
locality payoff — fewer contiguous key runs than Morton on a bbox read."""
import duckdb

from geotrellis_contrib_spark.functions import cells as C


def _grid(spark, bits):
    n = 1 << bits
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    return {(r.x, r.y): r.hkey
            for r in C.hilbert_key(df, "x", "y", bits).collect()}


def test_bijective_adjacent_corners(spark):
    got = _grid(spark, 3)
    assert sorted(got.values()) == list(range(64))
    inv = {v: k for k, v in got.items()}
    # THE Hilbert property: consecutive distances are 4-adjacent cells
    assert all(abs(inv[d][0] - inv[d + 1][0])
               + abs(inv[d][1] - inv[d + 1][1]) == 1 for d in range(63))
    assert inv[0] == (0, 0) and inv[63] == (7, 0)


def test_bits1_golden(spark):
    got = _grid(spark, 1)
    assert got == {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}


def test_duckdb_stage_parity(spark):
    got = _grid(spark, 4)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM "
                "(SELECT unnest(range(16)) x) a, "
                "(SELECT unnest(range(16)) y) b")
    dk = {(x, y): h for x, y, h in con.execute(
        C.sql_hilbert_ctes("pts", "x", "y", 4, "x, y")).fetchall()}
    assert dk == got


def test_fewer_ranges_than_morton(spark):
    # a 16x16 bbox inside the 64x64 grid: the sorted key set decomposes
    # into contiguous runs = row-group seeks on the sorted layout;
    # Hilbert's unit-step adjacency yields strictly fewer runs here
    def runs(keys):
        ks = sorted(keys)
        return 1 + sum(1 for a, b in zip(ks, ks[1:]) if b != a + 1)

    n = 1 << 6
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    h = {(r.x, r.y): r.hkey
         for r in C.hilbert_key(df, "x", "y", 6).collect()}
    box = [(x, y) for x in range(24, 40) for y in range(24, 40)]
    hilbert_runs = runs([h[c] for c in box])
    morton_runs = runs([int(C_m(x, y)) for x, y in box])
    assert hilbert_runs < morton_runs


def C_m(x, y):
    from geotrellis_contrib_spark.grid import morton_interleave
    return morton_interleave(x, y)
