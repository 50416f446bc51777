"""Randomized differential test: the engine-portable primitives
(chunk-level dedup, KMV sketch, classifier scoring) run on Spark vs
their DuckDB oracle SQL over randomized corpora written to parquet.

The driver's correctness gate replays fixed testdata; this fuzz covers
the corners that data never hits — ragged chunk tails, heavy duplicate
mass, singleton groups, weight-term collisions, whitespace runs — with
the offending seed printed on divergence."""

from __future__ import annotations

import random

import duckdb
import pytest

pytestmark = pytest.mark.slow  # three-engine hash-parity fuzz; run with -m "slow or not slow"
from pyspark.sql import functions as F

from power_generation_etl_spark.operators import scoring as sc
from power_generation_etl_spark.operators import sketch as sk

VOCAB = ["alpha", "beta", "gamma", "spark", "query", "slow", "fail", "x1", "y2"]


def _random_docs(rng: random.Random, n: int) -> list[tuple[int, str, str]]:
    docs = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 50))]
        # occasional duplicate of an earlier doc to exercise dedup mass
        if docs and rng.random() < 0.3:
            words = docs[rng.randrange(len(docs))][1].split(" ")
        docs.append((i, " ".join(words), f"s{rng.randint(0, 3)}"))
    return docs


def _norm(rows):
    return sorted(tuple(str(v) for v in r) for r in rows)


@pytest.mark.parametrize("seed", [11, 23, 37, 59])
def test_chunk_kmv_classifier_differential(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = _random_docs(rng, rng.randint(1, 40))
    pdf = spark.createDataFrame(docs, "doc_id long, text string, source string")
    path = str(tmp_path / f"docs_{seed}.parquet")
    pdf.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")

    from power_generation_etl_spark.operators import corpus as cp
    from power_generation_etl_spark.plans import ORACLES

    docs_df = spark.read.parquet(path)
    checks = {
        "chunk_dedup_stats": lambda: cp.chunk_dedup_stats(
            docs_df, "doc_id", "text", chunk=20
        ),
        "kmv_distinct_sources": lambda: sk.kmv_distinct(
            docs_df, "source", "text", k=16
        ),
        "quality_classifier_scores": lambda: sc.score_documents(
            spark, docs_df, "doc_id", "text"
        ),
    }
    for name, fn in checks.items():
        got = _norm([tuple(r) for r in fn().collect()])
        want = _norm(con.execute(ORACLES[name]).fetchall())
        assert got == want, f"{name} diverged at seed={seed}"


@pytest.mark.parametrize("seed", [7, 41])
def test_bloom_cms_hash_parity_three_ways(spark, seed):
    """bloom_position / cms_position must agree across all three
    evaluators — the Spark Column, the generated DuckDB SQL, and the
    driver-side Python probe — over randomized keys (unicode, empties,
    negatives, huge ints)."""
    from power_generation_etl_spark.operators import bloom as bl
    from power_generation_etl_spark.operators import sketch as sk

    rng = random.Random(seed)
    keys: list[str] = []
    for _ in range(40):
        kind = rng.randrange(4)
        if kind == 0:
            keys.append(str(rng.randint(-(10**12), 10**12)))
        elif kind == 1:
            keys.append(
                "".join(rng.choice("abcXYZ äöü языки 中文") for _ in range(rng.randint(0, 12)))
            )
        elif kind == 2:
            keys.append("")
        else:
            keys.append(str(rng.random()))
    m, k, w = 1536, 3, 256
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    spark_rows = df.select(
        "key",
        *[bl.bloom_position(F.col("key"), i, m).alias(f"b{i}") for i in range(k)],
        sk.cms_position(F.col("key"), 0, w).alias("c0"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(key VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in keys])
    sql_cols = ", ".join(
        [bl.bloom_position_sql("key", i, m) + f" AS b{i}" for i in range(k)]
        + [sk.cms_position_sql("key", 0, w) + " AS c0"]
    )
    duck = {r[0]: r[1:] for r in con.execute(f"SELECT key, {sql_cols} FROM t").fetchall()}
    for r in spark_rows:
        key = r["key"]
        got_spark = tuple(r[f"b{i}"] for i in range(k)) + (r["c0"],)
        assert got_spark == duck[key], f"seed={seed} key={key!r}"
        assert list(got_spark[:k]) == bl.bloom_positions_py(key, m, k)


@pytest.mark.parametrize("seed", [7, 41, 83])
def test_bottomk_quantile_differential(spark, tmp_path, seed):
    """Randomized bottom-k quantile sketch vs its generated DuckDB
    twin: random group sizes straddling k (exact-sample vs truncated
    paths), duplicate values (tie-break order), negative values
    (floor direction), random repartitioning (order independence)."""
    rng = random.Random(seed)
    rows = []
    key = 0
    for g in range(rng.randint(1, 5)):
        for _ in range(rng.randint(1, 40)):
            v = round(rng.uniform(-50, 50), 3)
            if rows and rng.random() < 0.2:
                v = rows[rng.randrange(len(rows))][2]  # duplicate value
            rows.append((f"g{g}", key, v))
            key += 1
    df = spark.createDataFrame(rows, "grp string, key long, v double")
    path = str(tmp_path / f"qk_{seed}.parquet")
    df.repartition(rng.randint(1, 7)).write.parquet(path)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    pcts = [25, 50, 90]
    got = _norm(
        sk.sample_quantiles(
            sk.bottomk_sample(
                spark.read.parquet(path), "grp", "key", "v", k=8
            ),
            pcts,
            value_scale=1000,
        ).collect()
    )
    want = _norm(
        con.execute(
            sk.bottomk_quantile_oracle_sql(
                "t", "grp", "key", "v", k=8, percents=pcts, value_scale=1000
            )
        ).fetchall()
    )
    assert got == want, f"seed {seed} diverged"


@pytest.mark.parametrize("seed", [13, 67])
def test_expectations_suite_differential(spark, tmp_path, seed):
    """Randomized expectations suite (random bands, random NULL/dup
    mass) vs the GENERATED oracle — both global and grouped forms."""
    from power_generation_etl_spark.operators.expectations import Suite

    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(1, 80)):
        rows.append(
            (
                f"s{rng.randint(0, 2)}",
                rng.randrange(30) if rng.random() < 0.9 else None,  # dup/null ids
                rng.choice(["a", "b", None]),
                round(rng.uniform(-10, 1000), 2),
            )
        )
    df = spark.createDataFrame(rows, "src string, id long, tag string, v double")
    path = str(tmp_path / f"exp_{seed}.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")

    lo, hi = sorted(rng.randrange(-2000, 2000) for _ in range(2))
    suite = (
        Suite()
        .size_at_least(rng.randrange(1, 100))
        .completeness("id", at_least_ppm=rng.randrange(0, 1_000_001))
        .uniqueness("id", at_least_ppm=rng.randrange(0, 1_000_001))
        .values_in("tag", ["a"], at_least_ppm=rng.randrange(0, 1_000_001))
        .satisfies("v_pos", "v >= 0", at_least_ppm=rng.randrange(0, 1_000_001))
        .min_scaled_between("v", lo, hi, scale=100)
        .max_scaled_between("v", lo, hi, scale=100)
        .mean_scaled_between("v", lo, hi, scale=100)
    )
    src = spark.read.parquet(path)
    assert _norm(suite.run(src).collect()) == _norm(
        con.execute(suite.oracle_sql("t")).fetchall()
    ), f"seed {seed} diverged (global)"
    assert _norm(suite.run_grouped(src, "src").collect()) == _norm(
        con.execute(suite.oracle_grouped_sql("t", "src")).fetchall()
    ), f"seed {seed} diverged (grouped)"
