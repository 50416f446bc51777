"""Similarity search over embedding columns (array<float>).

- `cosine(a, b)`: built-in expression (zip_with + aggregate) — doubles,
  sequential summation, deterministic.
- brute-force top-k and all-pairs near-dup as the exact baselines;
- random-hyperplane LSH bucketing as the scale path (candidates only
  meet within a bucket → the O(n²) join becomes O(Σ bucket²)).

Scale design: the LSH signature is computed in one projection (no
shuffle); the bucket join shuffles only (bucket_key, id, vector).
For 100 TB you'd additionally store vectors bucketed-by-signature so
the candidate join is shuffle-free.
"""

from __future__ import annotations

import math
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..lineage import cut as _cut
from ..memo import PlanMemo


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (deterministic across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_to_const_fast(vec: Column, query_vec: list[float]) -> Column:
    """Arrow-vectorized cosine against a constant query vector.

    The portable `cosine()` expression evaluates zip_with/aggregate
    lambdas interpreted (outside whole-stage codegen, 3-10×/element
    tax); this kernel moves each Arrow batch into numpy and runs one
    BLAS matvec per batch. NOT oracle-portable (numpy pairwise
    summation ≠ sequential fold at the last ulp) — the fast path for
    production scans; keep `cosine()` for oracle-checked runs."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def _cos(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series(np.zeros(0))
        return pd.Series((m @ q) / (np.linalg.norm(m, axis=1) * qn))

    return _cos(vec)


def cosine_pairwise_fast(a: Column, b: Column) -> Column:
    """Arrow-vectorized row-wise cosine of two vector columns (the
    candidate-verification hot loop). Same portability caveat as
    `cosine_to_const_fast`."""
    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = np.array(va.tolist(), dtype=np.float64)
        mb = np.array(vb.tolist(), dtype=np.float64)
        if ma.size == 0:
            return pd.Series(np.zeros(0))
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return _cos(a, b)


def cosine_pairs_seq(
    pairs: DataFrame, a_col: str, b_col: str, out_col: str
) -> DataFrame:
    """Vectorized BIT-EXACT twin of ``cosine(a_col, b_col)`` over pair
    rows (guide §4.2: hand whole Arrow batches to numpy instead of
    evaluating per-element lambdas).

    The portable ``cosine()`` expression runs zip_with/aggregate
    INTERPRETED — outside whole-stage codegen, ~3-10× per element — and
    the near-dup verification paths evaluate it over O(candidate-pairs)
    rows × dim elements, which dominated their wall time. This kernel
    replays the IDENTICAL IEEE-754 operation sequence vectorized across
    rows: the fold ``acc = (…(0.0 + p₀) + p₁…)`` becomes a column loop
    of numpy float64 adds (one vector op per dimension), so every
    intermediate double is bit-identical to the interpreted fold and to
    DuckDB's list_aggregate — the oracle contract is preserved, only
    the evaluation engine changes. numpy reductions (einsum/sum) are
    NOT used: pairwise summation reorders the adds.

    mapInPandas (an allowed catalog plan node, unlike scalar pandas
    UDFs), dropping the two vector columns so only the narrow result
    shuffles downstream. NULL vectors map to NULL (as the expression
    does); zero norms follow IEEE double division (NaN/Inf) on both
    paths.
    """
    keep = [f for f in pairs.schema.fields if f.name not in (a_col, b_col)]
    out_schema = StructType(list(keep) + [StructField(out_col, DoubleType())])
    keep_names = [f.name for f in keep]

    def kern(batches):
        # mapInArrow (r12; was mapInPandas): the Arrow→pandas hop
        # materialized every vector as a Python list and the kernel
        # re-parsed them with np.array(tolist()) — O(pairs·dim) Python
        # object churn that dominated the O(n²) entries. An Arrow
        # list<double> column is one contiguous values buffer + offsets,
        # so the (m, d) matrices are zero-copy reshapes; the scoring
        # loop is unchanged (same IEEE-754 op sequence, bit-exact).
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            n = rb.num_rows
            idx = {nm: i for i, nm in enumerate(rb.schema.names)}
            kept = [rb.column(idx[nm]) for nm in keep_names]
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    kept + [pa.array([], type=pa.float64())],
                    names=keep_names + [out_col],
                )
                continue
            va = rb.column(idx[a_col])
            vb = rb.column(idx[b_col])
            valid = pc.and_(va.is_valid(), vb.is_valid())
            mask = valid.to_numpy(zero_copy_only=False)
            res = np.full(n, np.nan)
            if mask.any():
                fa = va if mask.all() else va.filter(valid)
                fb = vb if mask.all() else vb.filter(valid)
                m = int(mask.sum())
                ma = fa.flatten().to_numpy().reshape(m, -1)
                mb = fb.flatten().to_numpy().reshape(m, -1)
                num = np.zeros(m)
                na = np.zeros(m)
                nb = np.zeros(m)
                for j in range(ma.shape[1]):
                    x, y = ma[:, j], mb[:, j]
                    num = num + x * y
                    na = na + x * x
                    nb = nb + y * y
                with np.errstate(divide="ignore", invalid="ignore"):
                    res[mask] = num / (np.sqrt(na) * np.sqrt(nb))
            out_arr = (
                pa.array(res, type=pa.float64())
                if mask.all()
                else pa.array(res, type=pa.float64(), mask=~mask)
            )
            yield pa.RecordBatch.from_arrays(
                kept + [out_arr], names=keep_names + [out_col]
            )

    return pairs.mapInArrow(kern, out_schema)


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    kernel: str = "expr",
) -> DataFrame:
    """Exact top-k by cosine for one query vector. TakeOrderedAndProject:
    per-partition heap + driver merge — no global sort.

    kernel='expr' (default) uses the portable sequential-fold
    expression (oracle-identical); kernel='arrow' uses the vectorized
    numpy kernel (same ranking, last-ulp value differences)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double_array(F.col(vec_col))
    sim = cosine_to_const_fast(v, query_vec) if kernel == "arrow" else cosine(v, q)
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def all_pairs_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    max_rows: int = 100_000,
) -> DataFrame:
    """Exact all-pairs cosine near-dup (id_a < id_b). O(n²) — the
    correctness baseline / verification twin of the LSH-bucketed plan;
    use `lsh_candidate_pairs` at scale.

    Guarded: refuses inputs above `max_rows` (100k rows ≈ 5e9 pairs —
    already hours of work) so a catalog run at a large sf can't silently
    go quadratic. Pass ``max_rows=0`` to disable the guard for an
    explicit exact run.
    """
    if max_rows:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"all_pairs_neardup is O(n²) and got n={n} > max_rows="
                f"{max_rows}; use lsh_candidate_pairs (the scale path) "
                "or pass max_rows=0 to force an exact run"
            )
    npar = df.sparkSession.sparkContext.defaultParallelism
    a = df.select(
        F.col(id_col).alias("id_a"), as_double_array(F.col(vec_col)).alias("va")
    ).repartition(npar)  # spread the nested-loop join across cores
    b = df.select(
        F.col(id_col).alias("id_b"), as_double_array(F.col(vec_col)).alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = cosine_pairs_seq(pairs, "va", "vb", "_cos")
    return (
        scored.select("id_a", "id_b", F.round("_cos", 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def mutual_knn_edges(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
    max_rows: int = 100_000,
) -> DataFrame:
    """Mutual k-nearest-neighbor graph over an embedding column: the
    undirected (id_a < id_b) pairs where EACH endpoint ranks the other
    in its cosine top-k. The mutual-kNN graph is the similarity-graph
    primitive real curation pipelines feed into clustering (SemDeDup's
    cluster step, label propagation, spectral partitioners) — one-sided
    kNN edges connect hubs to everything; mutuality keeps only locally
    reciprocal structure.

    Ranks are computed on the ROUNDED similarity (4dp, ties to the
    lower neighbor id) so the per-node ordering is bit-identical in
    both engines (the raw doubles already match — the sequential-fold
    `cosine` kernel mirrors DuckDB's list_aggregate fold — but rounding
    makes the tie-break domain explicit and portable).

    This is the O(n²) exact baseline (guarded by ``max_rows`` like
    `all_pairs_neardup`); at scale the candidate pairs come from the
    IVF cells or LSH buckets (`lsh_bucketed_neardup`'s candidate
    generation) and the same rank/mutuality algebra applies per
    candidate set. The per-node window is PARTITIONED by the node id —
    no global window at any scale.
    """
    if max_rows:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"mutual_knn_edges is O(n²) and got n={n} > max_rows="
                f"{max_rows}; generate candidates with an IVF/LSH prune "
                "or pass max_rows=0 to force an exact run"
            )
    from pyspark.sql.window import Window

    npar = df.sparkSession.sparkContext.defaultParallelism
    va, vb = F.col("va"), F.col("vb")
    # The norms depend on one side only, so they are hoisted to the
    # n-scale side projections — the O(n²) per-pair expression runs
    # ONLY the dot fold instead of dot + two norms (same fold over the
    # same array → identical doubles; the dot/(na*nb) op order is
    # unchanged, so the result is bit-identical). The dot stays the
    # interpreted in-JVM fold deliberately: this exact path emits BOTH
    # directions of every pair (twice `all_pairs_neardup`'s volume) and
    # the A/Bs measured BOTH alternatives slower here — the Arrow
    # kernel (cold 9.4→15.3 s: 2·n²·dim doubles across the boundary)
    # and an unrolled static-dim getItem chain (~2× slower: 64
    # nested-add terms exceed what codegen compiles and fall back to
    # per-node interpreted eval) — see OPTIMIZATION_r11.md.
    a = df.select(
        F.col(id_col).alias("id_a"),
        as_double_array(F.col(vec_col)).alias("va"),
    ).withColumn("_na", norm(va)).repartition(npar)
    b = df.select(
        F.col(id_col).alias("id_b"),
        as_double_array(F.col(vec_col)).alias("vb"),
    ).withColumn("_nb", norm(vb))
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(
            dot(va, vb) / (F.col("_na") * F.col("_nb")), 4
        ).alias("s4"),
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("s4"), "id_b")
    topk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("id_a", "id_b", "s4")
    )
    rev = topk.select(
        F.col("id_a").alias("ra"), F.col("id_b").alias("rb")
    )
    return (
        topk.where(F.col("id_a") < F.col("id_b"))
        .join(
            rev,
            (F.col("id_a") == F.col("rb")) & (F.col("id_b") == F.col("ra")),
        )
        .select("id_a", "id_b", F.col("s4").alias("cosine_sim"))
        .orderBy("id_a", "id_b")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (SimHash-for-vectors) signature: one bit per
    plane, packed into a bigint — a single projection, no shuffle."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(dot(vec, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("bigint")


# Materialized hyperplane band-key table (r12) — same lifecycle as the
# minhash signature memo: 3 consumers per call, LRU-owned blocks.
_VECLSH_MEMO = PlanMemo("vec_lsh_bands", cap=2)


def lsh_bucketed_neardup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_bands: int = 3,
    seed: int = 42,
    kernel: str = "expr",
    bucket_cap: int | None = None,
    max_candidates: int | None = None,
) -> DataFrame:
    """Approximate near-dup: candidates must share at least one band of
    the hyperplane signature; exact cosine verifies the candidates.
    Recall < 1 by construction (that's the trade); precision = 1 since
    every emitted pair is exactly verified. kernel='arrow' runs the
    verification cosine through the vectorized numpy kernel.

    ``max_candidates`` / ``bucket_cap`` — the counted candidate-volume
    guard every banded family carries (r11; same contract as
    ``minhash_lsh_pairs``): with a FIXED hyperplane count the band-key
    domain is constant (2^(n_planes/n_bands) keys per band), so bucket
    sizes grow ∝ N and the candidate join is inherently quadratic —
    the r11 decade probe measured warm α→1.8-2.0 (217s at 10× sf0.1)
    before this guard. One aggregation computes the exact per-bucket
    volume; above the bound (default
    ``DEFAULT_ALLPAIRS_MAX_CANDIDATES``, env
    ``SPARK_ETL_ALLPAIRS_MAX_CANDIDATES``) the guard engages the
    largest fitting ``bucket_cap`` with a UserWarning. A pair is
    missed only if EVERY band it collides on exceeds the cap;
    verification stays exact, so emitted cosines never change — only
    which pairs are found. At production scale the right recall knob
    is MORE PLANES (the key domain must grow with N); the cap is the
    safety net that keeps a mis-sized index subquadratic."""
    probe = df.select(vec_col).head()
    if probe is None:  # empty corpus -> empty pairs, stable schema
        idt = dict(df.dtypes).get(id_col, "bigint")
        return df.sparkSession.createDataFrame(
            [], f"id_a {idt}, id_b {idt}, cosine_sim double"
        )
    dim = len(probe[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    per_band = n_planes // n_bands
    v = as_double_array(F.col(vec_col))
    sig = lsh_signature(v, planes)
    mask = (1 << per_band) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sig, b * per_band).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    npar = df.sparkSession.sparkContext.defaultParallelism
    # Band-key table materialized once via the memo (r12): the volume
    # guard and both candidate-join sides otherwise each re-ran the
    # n_planes interpreted dot folds per row (the signature is a pure
    # projection, but across 3 consumers it was the dominant per-row
    # cost). ids+keys only — vectors join back per DISTINCT pair below,
    # the r11 ids-only rule.
    src = df.select(F.col(id_col).alias("id"), v.alias("_v"))
    tagged = _VECLSH_MEMO.get_or_build(
        (n_planes, n_bands, seed, npar),
        src,
        lambda: _cut(
            df.select(
                F.col(id_col).alias("id"), F.explode(bands).alias("bk")
            ).repartition(npar, "bk")
        ),
    )
    effective_cap = bucket_cap
    if effective_cap is None:
        from power_generation_etl_spark.operators.minhash import (
            _guard_volume_cap,
            _resolve_max_candidates,
        )

        bound = _resolve_max_candidates(max_candidates)
        if bound is not None:
            vol_df = (
                tagged.groupBy("bk")
                .agg(F.count(F.lit(1)).alias("p"))
                .groupBy("p")
                .agg(
                    (F.count(F.lit(1)) * F.col("p") * (F.col("p") - 1)).alias(
                        "vol"
                    )
                )
                .select(F.col("p").alias("df"), "vol")
            )
            effective_cap = _guard_volume_cap(
                vol_df,
                ("cos_lsh", n_planes, n_bands, seed),
                df.select(F.col(id_col).alias("doc_id"), v.alias("_t")),
                bound,
                "lsh_bucketed_neardup",
                "bucket_cap",
                "band buckets larger than the cap leave candidate "
                "generation — a pair is missed only if EVERY band it "
                "collides on exceeds the cap; verification stays exact",
            )
    if effective_cap is not None:
        small = (
            tagged.groupBy("bk")
            .agg(F.count(F.lit(1)).alias("_p"))
            .where(F.col("_p") <= effective_cap)
            .select("bk")
        )
        tagged = tagged.join(F.broadcast(small), "bk")
    # Candidates as IDS ONLY (the minhash-proven shape): carrying the
    # 64-double vectors through the bucket join + pair dedup shuffles
    # ~1 KB per candidate where 16 bytes suffice — at the guard's 5e7
    # candidate bound that's a ~50 GB vs ~1 GB shuffle. Vectors join
    # back once per DISTINCT pair for verification.
    left = tagged.select("id", "bk")
    right = tagged.select(F.col("id").alias("id2"), F.col("bk").alias("bk2"))
    cand_ids = (
        left.join(right, (F.col("bk") == F.col("bk2")) & (F.col("id") < F.col("id2")))
        .select(F.col("id").alias("id_a"), F.col("id2").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = df.select(F.col(id_col).alias("id_a"), v.alias("vec"))
    vb = df.select(F.col(id_col).alias("id_b"), v.alias("vec2"))
    cands = cand_ids.join(va, "id_a").join(vb, "id_b")
    if kernel == "arrow":
        scored = cands.select(
            "id_a",
            "id_b",
            cosine_pairwise_fast(F.col("vec"), F.col("vec2")).alias("_cos"),
        )
    else:
        scored = cosine_pairs_seq(cands, "vec", "vec2", "_cos")
    return (
        scored.select("id_a", "id_b", F.round("_cos", 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def squared_dist(v: Column, cent: list[float]) -> Column:
    """Sequential-order squared euclidean distance to a constant vector —
    (a-b)*(a-b) termwise, left-fold sum, so an external SQL engine
    computes the bit-identical value."""
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cell(v: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid cell id as a single projection (centroids are
    driver-side constants — no join, no shuffle). Ties break to the
    lowest cell id (cents must be sorted ascending by id)."""
    dists = F.array(*[squared_dist(v, c) for _, c in cents])
    idx = F.array_position(dists, F.array_min(dists)).cast("int")  # 1-based, first=lowest id
    cell_ids = F.array(*[F.lit(cid) for cid, _ in cents])
    return F.element_at(cell_ids, idx)


def assign_cell_fast(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Arrow-vectorized nearest-centroid assignment: one numpy distance
    matrix per Arrow batch instead of k interpreted fold passes per row.
    Same tie-break (lowest cell id wins — argmin returns the first
    minimum and cents are sorted ascending). Same portability caveat as
    the other fast kernels: numpy's summation order differs from the
    sequential fold in the last ulp, so assignments can differ from
    `assign_cell` only on exact distance ties — use for production
    scans, keep `assign_cell` for oracle-checked runs."""
    import numpy as np

    C = np.asarray([c for _, c in cents], dtype=np.float64)  # k x dim
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
    c_sq = (C * C).sum(axis=1)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        m = np.array(v.tolist(), dtype=np.float64)
        if m.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        # ||v-c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
        d = -2.0 * (m @ C.T) + c_sq
        return pd.Series(ids[np.argmin(d, axis=1)].astype(np.int32))

    return _assign(vec)


def _assign_seq_fast(cents: list[tuple[int, list[float]]]) -> Column:
    """BIT-EXACT vectorized twin of `assign_cell` for TRAINING jobs.

    Replays `squared_dist`'s sequential fold — acc = acc + (a−b)·(a−b),
    one numpy float64 vector op per dimension — per centroid, then
    takes the FIRST minimum (np.argmin ≡ array_position(array_min):
    both return the first exact-equality hit, and cents are sorted
    ascending by id, so ties break identically). Every intermediate
    double is bit-identical to the interpreted expression, so the
    training trajectory (and with it every oracle that unrolls it) is
    unchanged — only the evaluation engine moves from per-element
    interpreted lambdas (k·dim per row) to k·dim vectorized ops per
    Arrow batch.

    Scalar pandas UDFs are banned from CATALOG plans (the hygiene gate
    counts ArrowEvalPython), so this kernel is used ONLY inside the
    driver-collected Lloyd's iterations; serving/assignment expressions
    in returned plans keep `assign_cell`."""
    ids = np.asarray([cid for cid, _ in cents], dtype=np.int32)
    C = [np.asarray(c, dtype=np.float64) for _, c in cents]

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        mat = np.array(v.tolist(), dtype=np.float64)
        if mat.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        n, d = mat.shape
        dist = np.empty((n, len(C)))
        for ci, c in enumerate(C):
            acc = np.zeros(n)
            for j in range(d):
                t = mat[:, j] - c[j]
                acc = acc + t * t
            dist[:, ci] = acc
        return pd.Series(ids[np.argmin(dist, axis=1)])

    return _assign(F.col("_v"))


def _assign_seq_fast_multi(
    books: list[list[tuple[int, list[float]]]]
) -> Column:
    """`_assign_seq_fast` for the batched PQ trainer: rows carry a
    subspace tag `j` and the kernel dispatches to that subspace's
    codebook — one Arrow batch crossing instead of an m-way when-chain
    of k interpreted fold passes each. Same bit-exactness argument."""
    ids = [np.asarray([cid for cid, _ in b], dtype=np.int32) for b in books]
    Cs = [[np.asarray(c, dtype=np.float64) for _, c in b] for b in books]

    @F.pandas_udf("int")
    def _assign(js: pd.Series, v: pd.Series) -> pd.Series:
        mat = np.array(v.tolist(), dtype=np.float64)
        out = np.zeros(len(v), dtype=np.int32)
        if mat.size == 0:
            return pd.Series(out)
        jarr = js.to_numpy()
        for j in range(len(Cs)):
            sel = jarr == j
            if not sel.any():
                continue
            sub = mat[sel]
            n, d = sub.shape
            dist = np.empty((n, len(Cs[j])))
            for ci, c in enumerate(Cs[j]):
                acc = np.zeros(n)
                for jj in range(d):
                    t = sub[:, jj] - c[jj]
                    acc = acc + t * t
                dist[:, ci] = acc
            out[sel] = ids[j][np.argmin(dist, axis=1)]
        return pd.Series(out)

    return _assign(F.col("j"), F.col("_v"))


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    kernel: str = "expr",
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means over DataFrame ops, for IVF cell training.

    Scale design: the driver holds only k×dim floats; assignment is a
    projection (no shuffle) and each update is ONE aggregation whose
    map-side partial combine reduces every partition to ≤k rows before
    the shuffle — iters jobs total, each linear in the data.

    Deterministic and oracle-reproducible: seeds are the k lowest-id
    vectors, centroids are rounded to 6 decimals after every update
    (forcing bit-identical inputs for the next assignment in any engine
    that replays the trajectory in SQL), empty cells are dropped, and
    distance ties assign to the lowest cell id.

    kernel='expr' (default) keeps the oracle-reproducible sequential-fold
    distance; kernel='arrow' assigns cells through the vectorized numpy
    kernel (`assign_cell_fast`) — the production path for big corpora,
    identical assignments except on exact distance ties.

    Trainings are MEMOIZED per (corpus plan, k, iters, kernel) via
    `memo.PlanMemo` — a session that builds several indexes over the
    same corpus with the same hyper-parameters (e.g. the raw and
    residual IVF-PQ variants share their coarse quantizer) trains once;
    the training is deterministic, so memoization is invisible to the
    oracles. Callers get a fresh copy (mutation-safe)."""
    src = df.select(
        F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_v")
    )
    cents = _KMEANS_MEMO.get_or_build(
        (k, iters, kernel), src, lambda: _kmeans_train_impl(src, k, iters, kernel)
    )
    return [(i, list(c)) for i, c in cents]


# cap 8: an IVF-PQ build inserts 1 coarse + m=4 subspace trainings; the
# residual twin must still find the coarse quantizer behind them.
_KMEANS_MEMO = PlanMemo("kmeans_train", cap=8)

# Shared materialized (id, vector) training projection (r12): the
# coarse k-means trainer and the PQ trainer over one corpus scan the
# IDENTICAL projection (column names aside), so each paid its own
# lineage-cut materialization pass. One memoized cut serves both —
# keyed on the name-canonicalized plan (toDF adds the same outer
# projection on both call sites, so the canonicalized plans compare
# sameSemantics). cap=2: two corpora in flight (e.g. raw + residual).
_ANN_BASE_MEMO = PlanMemo("ann_train_base", cap=2)


def _train_base(src: DataFrame) -> DataFrame:
    """Memoized lineage-cut of a 2-column (id, vector) training
    projection; returns columns (_id, _v) whatever the caller's second
    column name was."""
    canon = src.toDF("_id", "_v")
    return _ANN_BASE_MEMO.get_or_build((), canon, lambda: _cut(canon))


def _kmeans_train_impl(
    src: DataFrame, k: int, iters: int, kernel: str
) -> list[tuple[int, list[float]]]:
    # Materialize the (id, vec) projection once: every Lloyd's round is
    # a fresh job, and without this each one re-scans and re-casts the
    # source (at scale: persist to MEMORY_AND_DISK instead —
    # lineage.cut's persist mode). Shared with the PQ trainer (r12).
    base = _train_base(src)
    v = F.col("_v")
    seeds = base.orderBy("_id").limit(k).select(v.alias("e")).collect()
    cents = [(i, [float(x) for x in r["e"]]) for i, r in enumerate(seeds)]
    if not cents:  # empty corpus -> no cells (callers emit empty results)
        return []
    dim = len(cents[0][1])
    # Training runs in driver-collected jobs, so the expr path can use
    # the bit-exact vectorized assigner (same trajectory, no k·dim
    # interpreted folds per row); 'arrow' keeps the BLAS identity
    # kernel (ties may differ — the documented production trade).
    for _ in range(iters):
        cell = (
            assign_cell_fast(v, cents)
            if kernel == "arrow"
            else _assign_seq_fast(cents)
        )
        rows = (
            base.groupBy(cell.alias("cell"))
            .agg(*[F.round(F.avg(v.getItem(i)), 6).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        cents = sorted(
            (int(r["cell"]), [float(r[f"c{i}"]) for i in range(dim)]) for r in rows
        )
    return cents


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_probe_fraction: float = 0.25,
    label_col: str | None = None,
    n_cells: int = 8,
    train_iters: int = 3,
    kernel: str = "expr",
) -> DataFrame:
    """IVF-style ANN: partition vectors into coarse cells (a provided
    label column, or k-means cells trained by `kmeans_train`), rank
    cells by centroid similarity to the query, and search only the
    closest `n_probe_fraction` of cells exactly.

    At 100 TB the cell id is a partition column, so probing reads only
    the probed partitions (partition pruning on the vector table)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double_array(F.col(vec_col))
    if label_col is not None:
        cell = F.col(label_col)
        # Centroids: per-cell mean vector — one narrow aggregation.
        probe = df.select(vec_col).head()
        if probe is None:  # empty corpus -> empty top-k, stable schema
            idt = dict(df.dtypes).get(id_col, "bigint")
            return df.sparkSession.createDataFrame(
                [], f"{id_col} {idt}, cosine_sim double"
            )
        dim = len(probe[0])
        centroids = df.groupBy(cell.alias("cell")).agg(
            F.array(
                *[F.avg(v.getItem(i)).alias(f"c{i}") for i in range(dim)]
            ).alias("centroid"),
        )
        ranked = centroids.select(
            "cell", cosine(F.col("centroid"), q).alias("cell_sim")
        ).orderBy(F.col("cell_sim").desc(), F.col("cell"))
    else:
        cents = kmeans_train(
            df, id_col, vec_col, k=n_cells, iters=train_iters, kernel=kernel
        )
        if not cents:  # empty corpus -> empty top-k, stable schema
            idt = dict(df.dtypes).get(id_col, "bigint")
            return df.sparkSession.createDataFrame(
                [], f"{id_col} {idt}, cosine_sim double"
            )
        cell = (
            assign_cell_fast(v, cents) if kernel == "arrow" else assign_cell(v, cents)
        )
        spark = df.sparkSession
        ranked = spark.createDataFrame(
            [(cid, c) for cid, c in cents], "cell int, centroid array<double>"
        ).select("cell", cosine(F.col("centroid"), q).alias("cell_sim")).orderBy(
            F.col("cell_sim").desc(), F.col("cell")
        )
    # One collect (≤ n_cells tiny rows) instead of count + limit-collect.
    ranked_rows = ranked.collect()
    n_probe = max(1, int(math.ceil(len(ranked_rows) * n_probe_fraction)))
    probe_cells = [r["cell"] for r in ranked_rows[:n_probe]]
    probed = df.filter(cell.isin(probe_cells))
    sim = cosine_to_const_fast(v, query_vec) if kernel == "arrow" else cosine(v, q)
    return (
        probed.select(F.col(id_col), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_cells: int = 8,
    train_iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF layout: train coarse cells, then write the
    vector table hive-partitioned by cell id. Returns the centroids
    (driver-side metadata, k×dim floats) — at serve time cell ranking
    needs NO scan, and probing reads only the probed partition
    directories (PartitionFilters on the parquet scan).

    This is the `ivf_topk` docstring's 100 TB claim made concrete: the
    cell id IS a partition column."""
    cents = kmeans_train(df, id_col, vec_col, k=n_cells, iters=train_iters)
    v = as_double_array(F.col(vec_col))
    out = df.select(
        F.col(id_col).alias("vec_id"),
        v.alias("embedding"),
        assign_cell(v, cents).alias("cell"),
    )
    out.write.mode("overwrite").partitionBy("cell").parquet(path)
    return cents


def ivf_probe_index(
    spark,
    path: str,
    cents: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    n_probe_fraction: float = 0.25,
    kernel: str = "expr",
) -> DataFrame:
    """Probe a `write_ivf_index` layout: rank cells against the query
    driver-side (centroids are constants — zero jobs), then scan ONLY
    the probed cell partitions. The `cell IN (...)` predicate prunes at
    the partition-directory level — check PartitionFilters in
    .explain() — so probe cost is O(probed cells), not O(table)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    sims = sorted(
        (
            (float(np.dot(np.asarray(c), q) / (np.linalg.norm(np.asarray(c)) * qn)), cid)
            for cid, c in cents
        ),
        key=lambda t: (-t[0], t[1]),
    )
    n_probe = max(1, int(math.ceil(len(sims) * n_probe_fraction)))
    probe_cells = [cid for _, cid in sims[:n_probe]]
    df = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    v = F.col("embedding")
    qa = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_to_const_fast(v, query_vec) if kernel == "arrow" else cosine(v, qa)
    return (
        df.select(F.col("vec_id"), F.round(sim, 4).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Embedding compression: symmetric int8 scalar quantization.
# ---------------------------------------------------------------------------


def global_abs_max(df: DataFrame, vec_col: str) -> DataFrame:
    """1-row DataFrame with the corpus-wide max |x| over every vector
    element — the symmetric quantization scale source. Per-vector fold
    then a global max: map-side combined, shuffle carries one double
    per partition."""
    per_vec = F.aggregate(
        as_double_array(F.col(vec_col)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    return df.agg(F.max(per_vec).alias("_absmax"))


def int8_quantize_report(
    df: DataFrame, id_col: str, vec_col: str, *extra_cols: str
) -> DataFrame:
    """Symmetric int8 quantization quality report per vector:
    (id, *extra, max_abs_err, cos_orig_quant).

    q_i = clamp(round(x_i·127/scale), −127, 127) with a single global
    scale (corpus max |x|), the layout ANN indexes ship (4× smaller
    than float32, 8× smaller than float64). The report measures what
    the compression costs: worst-element reconstruction error and the
    cosine between the original and dequantized vector (ANN recall
    proxy).

    Exactness: scale is a broadcast 1-row aggregate (no driver
    collect); every per-element op is a scalar double expression with
    no reordering, and the dot/norm folds are sequential — so the
    DuckDB oracle (list_transform/list_aggregate) matches bit-for-bit
    before the final rounding. At 100 TB this is one scan for the
    scale and one scan for the report; the quantized vectors
    themselves would be written as array<tinyint> alongside."""
    v = as_double_array(F.col(vec_col))
    scale = F.col("_absmax")
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127.0), F.least(F.lit(127.0), F.round(x * 127.0 / scale, 0))
        ),
    )
    deq = F.transform(q, lambda x: x * scale / 127.0)
    err = F.aggregate(
        F.zip_with(v, deq, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return (
        df.crossJoin(F.broadcast(global_abs_max(df, vec_col)))
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.round(err, 6).alias("max_abs_err"),
            # try_divide: a zero vector has no direction — report NULL
            # cosine instead of an ANSI divide-by-zero abort.
            F.round(
                F.try_divide(dot(v, deq), norm(v) * norm(deq)), 6
            ).alias("cos_orig_quant"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN.
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Train per-subspace PQ codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    ``m`` contiguous subvectors and run the deterministic Lloyd's
    trainer (lowest-id seeds, 6-dp-rounded centroids, lowest-cell
    tie-breaks) independently per subspace. Driver state is
    m × k_sub × (dim/m) floats; each training pass is the same
    linear-cost assignment/update loop as IVF.

    The FULL codebook set is MEMOIZED per (training-input plan, m,
    k_sub, iters) — keyed on the UNCUT (id, enc) projection so two
    invocations over the same corpus (including the residual twin's
    second bench run) compare `sameSemantics`; the lineage cut that
    feeds the m×iters training scans happens inside the builder, where
    it can't poison the key with a never-equal LogicalRDD. Callers get
    a fresh copy (mutation-safe)."""
    df = df.where(F.col(vec_col).isNotNull())
    src = df.select(
        F.col(id_col).alias("_id"), as_double_array(F.col(vec_col)).alias("_enc")
    )
    books = _PQ_MEMO.get_or_build(
        (m, k_sub, iters), src, lambda: _pq_train_impl(src, m, k_sub, iters)
    )
    return [[(i, list(c)) for i, c in b] for b in books]


# cap 4: raw + residual codebooks for two corpora in flight.
_PQ_MEMO = PlanMemo("pq_books", cap=4)


def _pq_train_impl(
    src: DataFrame, m: int, k_sub: int, iters: int
) -> list[list[tuple[int, list[float]]]]:
    """Batched Lloyd's over ALL m subspaces at once (r9): the corpus is
    exploded to (subspace j, subvector) rows and each training round is
    ONE groupBy(j, cell) aggregation — one corpus scan per round
    instead of m (plus one seed collect instead of m: every subspace
    seeds from the same lowest-_id rows). At 100 TB that is the
    difference between reading the vector table iters times and
    m·iters times. The trajectory is identical to training each
    subspace independently (pytest-asserted against the sequential
    twin): same seeds, same assign_cell tie-breaks per subspace, same
    per-(j, cell) membership, and the 6-dp centroid rounding absorbs
    partial-aggregation summation-order noise exactly as it does for
    the unrolled DuckDB oracles.

    Measured honestly (sf0.1, local[32], cache-resident input): warm
    4.3s vs the sequential twin's 4.9s — the job-count saving is
    largely swamped locally because the cut base is block-cache reads
    either way and the m-way when-chain costs more codegen. The win
    this shape buys is at deployment scale: when the vector table is
    parquet/DISK_ONLY, each round is ONE read of it instead of m."""
    probe = src.select("_enc").head()
    if probe is None:
        return []
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    # Materialize the projection once: it feeds the iters training
    # scans. Shared with the coarse k-means trainer over the same
    # corpus (r12) — the cut table is identical up to the column name.
    base = _train_base(src).toDF("_id", "_enc")
    seed_rows = base.orderBy("_id").limit(k_sub).select("_enc").collect()
    books: list[list[tuple[int, list[float]]]] = [
        [
            (i, [float(x) for x in r["_enc"][j * sub : (j + 1) * sub]])
            for i, r in enumerate(seed_rows)
        ]
        for j in range(m)
    ]
    exploded = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col("_enc"), j * sub + 1, sub).alias("v"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s")
    ).select(F.col("s.j").alias("j"), F.col("s.v").alias("_v"))
    for _ in range(iters):
        # vectorized per-subspace dispatch (bit-exact twin of the flat
        # assign_cell when-chain; training-job-only kernel)
        cell = _assign_seq_fast_multi(books)
        rows = (
            exploded.groupBy(F.col("j"), cell.alias("cell"))
            .agg(
                *[
                    F.round(F.avg(F.col("_v").getItem(i)), 6).alias(f"c{i}")
                    for i in range(sub)
                ]
            )
            .collect()
        )
        books = [
            sorted(
                (int(r["cell"]), [float(r[f"c{i}"]) for i in range(sub)])
                for r in rows
                if r["j"] == j
            )
            for j in range(m)
        ]
    return books


def _pq_train_sequential_impl(
    src: DataFrame, m: int, k_sub: int, iters: int
) -> list[list[tuple[int, list[float]]]]:
    """The pre-r9 per-subspace trainer (m independent k-means over
    sliced subvectors — m seed collects + m jobs per round). Kept as
    the differential-test twin for the batched implementation above;
    not used by the product path."""
    probe = src.select("_enc").head()
    if probe is None:
        return []
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    base = _cut(src)
    books = []
    for j in range(m):
        sliced = base.select(
            F.col("_id"), F.slice(F.col("_enc"), j * sub + 1, sub).alias("_v")
        )
        books.append(_kmeans_train_impl(sliced, k_sub, iters, "expr"))
    return books


def _py_squared_dist(a: list[float], b: list[float]) -> float:
    """Driver-side twin of `squared_dist`: same ascending-index
    left-fold, so the double is bit-identical to the Column form."""
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc = acc + d * d
    return acc


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    k: int = 10,
) -> DataFrame:
    """PQ top-k with asymmetric distance computation (ADC): encode each
    vector as m small codes (nearest sub-centroid per subspace — a pure
    projection against literal codebooks), precompute the query's
    distance to every sub-centroid on the DRIVER (m × k_sub doubles),
    and rank by the sum of m literal-array lookups.

    The scan never touches float vectors at query time in a deployed
    layout (codes are 1 byte per subspace — a 64-dim float vector
    compresses 64×); here encode+rank run in one pass to stay
    self-contained. Distance estimates are ADC approximations — rank
    quality degrades gracefully with k_sub; the exact brute-force and
    IVF paths remain the recall baselines. Everything is deterministic:
    codebook trajectories reproduce in SQL, the ADC sum is a fixed-order
    add of exactly-reproducible doubles."""
    df = df.where(F.col(vec_col).isNotNull())
    books = pq_train(df, id_col, vec_col, m=m, k_sub=k_sub, iters=iters)
    if not books:
        idt = dict(df.dtypes).get(id_col, "bigint")
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {idt}, adc_d2 double"
        )
    sub = len(query_vec) // m
    v = as_double_array(F.col(vec_col))
    adc = None
    for j, book in enumerate(books):
        slice_j = F.slice(v, j * sub + 1, sub)
        q_slice = query_vec[j * sub : (j + 1) * sub]
        dists = F.array(*[squared_dist(slice_j, c) for _, c in book])
        idx = F.array_position(dists, F.array_min(dists)).cast("int")
        lut = F.array(
            *[F.lit(_py_squared_dist(q_slice, c)) for _, c in book]
        )
        term = F.element_at(lut, idx)
        adc = term if adc is None else adc + term
    return (
        df.select(F.col(id_col), F.round(adc, 4).alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(k)
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    kernel: str = "expr",
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — k-means clusters the
    vectors, then only WITHIN-cluster pairs are compared by cosine;
    the higher-id member of every pair above `threshold` is dropped
    (the "keep one representative" policy, transitive chains keep the
    lowest id of each chain's pairwise-linked prefix — the standard
    one-pass rule, same as the text near-dup family).

    Scale design: clustering makes the pair join O(Σ cluster²) instead
    of O(n²) — the published algorithm's exact trade. k is the scale
    knob: hold the expected cluster size n/k constant (SemDeDup used
    50k clusters for LAION-440M, ~9k vectors/cluster), so the per-
    cluster quadratic work is bounded and spread across the shuffle's
    (cell) partitions. Training is `kmeans_train` — iters linear
    passes, driver holds k×dim floats; assignment is a projection.
    Deterministic and oracle-reproducible (seeded centroids, 6-decimal
    rounding per round, lowest-cell distance tie-break, 4-decimal
    cosine rounding at the threshold compare).

    Returns per-cluster stats (cell, n_vectors, n_dropped), cell-
    ordered — the shape a dedup report wants; join the dropped-id set
    back to filter the corpus in a pipeline.
    """
    spark = df.sparkSession
    cents = kmeans_train(df, id_col, vec_col, k=k, iters=iters, kernel=kernel)
    if not cents:
        return spark.createDataFrame(
            [], "cell int, n_vectors bigint, n_dropped bigint"
        )
    v = as_double_array(F.col(vec_col))
    assigner = assign_cell_fast if kernel == "arrow" else assign_cell
    assigned = df.select(
        F.col(id_col).alias("id"), v.alias("vec"), assigner(v, cents).alias("cell")
    ).transform(_cut)  # feeds three subtrees: counts + both join sides
    npar = spark.sparkContext.defaultParallelism
    left = assigned.repartition(npar, "cell")
    right = assigned.select(
        F.col("id").alias("id2"),
        F.col("vec").alias("vec2"),
        F.col("cell").alias("cell2"),
    )
    joined = left.join(
        right,
        (F.col("cell") == F.col("cell2")) & (F.col("id") < F.col("id2")),
    )
    if kernel == "arrow":
        scored = joined.select(
            "cell",
            F.col("id2").alias("id"),
            cosine_pairwise_fast(F.col("vec"), F.col("vec2")).alias("_cos"),
        )
    else:
        scored = cosine_pairs_seq(
            joined.select("cell", "id2", "vec", "vec2"), "vec", "vec2", "_cos"
        ).select("cell", F.col("id2").alias("id"), F.col("_cos"))
    dropped = (
        scored.select("cell", "id", F.round("_cos", 4).alias("s"))
        .where(F.col("s") >= threshold)
        .select("cell", "id")
        .distinct()
    )
    counts = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )
    drops = dropped.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dropped")
    )
    return (
        counts.join(drops, "cell", "left")
        .select(
            F.col("cell").cast("int").alias("cell"),
            "n_vectors",
            F.coalesce(F.col("n_dropped"), F.lit(0)).cast("bigint").alias(
                "n_dropped"
            ),
        )
        .orderBy("cell")
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    n_cells: int = 8,
    coarse_iters: int = 3,
    n_probe_fraction: float = 0.25,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    k: int = 10,
    by_residual: bool = False,
) -> DataFrame:
    """IVF-PQ top-k (the FAISS ``IndexIVFPQ`` composition): a coarse
    k-means quantizer prunes the corpus to the closest
    ``n_probe_fraction`` of cells, then PQ codes ranked by the
    asymmetric-distance sum pick the top-k inside the probed cells —
    the standard billion-scale ANN serving layout (Jégou et al., PAMI
    2011 §IV).

    ``by_residual=False``: codebooks train on raw vectors — code
    assignment is cell-independent (one projection, one m·k_sub query
    LUT). ``by_residual=True`` (FAISS's default quality knob): the PQ
    encodes each vector's RESIDUAL against its coarse centroid, which
    centers every cell's distribution at the origin and makes the same
    k_sub codes resolve much finer distances; the cost is one
    m×k_sub LUT per PROBED cell (query-residual distances, still a
    driver-literal map — n_probe·m·k_sub doubles) and a residual
    projection before encoding.

    Scale shape: all trainings are linear Lloyd's passes holding only
    (n_cells + m·k_sub)·dim driver floats; the coarse cell id is the
    table's partition column in a deployed index (`write_ivf_index`),
    so probing reads only the probed partitions AND scans 1-byte/
    subspace codes instead of float vectors — cell pruning multiplies
    with PQ's 64× compression. Deterministic end-to-end: every
    trajectory reproduces in SQL (lowest-id seeds, 6-dp rounding,
    lowest-cell ties), residuals and LUTs are fixed-order IEEE ops,
    the ADC sum is a fixed-order add, ties rank by id.
    """
    df = df.where(F.col(vec_col).isNotNull())
    cents = kmeans_train(df, id_col, vec_col, k=n_cells, iters=coarse_iters)
    if not cents:
        idt = dict(df.dtypes).get(id_col, "bigint")
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {idt}, cell int, adc_d2 double"
        )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double_array(F.col(vec_col))
    spark = df.sparkSession
    dim = len(cents[0][1])
    cell = assign_cell(v, cents)
    if by_residual:
        # residual = v - centroid[cell], via a literal cell→centroid
        # map. STAGED: the map lookup materializes once per row in its
        # own projection — inlining it under all `dim` subtraction
        # expressions re-evaluates the map construction per dimension
        # (measured ~2x on the whole query at dim=64).
        cmap = F.map_from_arrays(
            F.array(*[F.lit(int(cid)) for cid, _ in cents]),
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in c])
                    for _, c in cents
                ]
            ),
        )
        staged = df.select(
            F.col(id_col),
            v.alias("_v0"),
            cell.alias("_cell"),
            F.element_at(cmap, cell).alias("_crow"),
        )
        enc_vec = F.array(
            *[
                F.col("_v0").getItem(i) - F.element_at(F.col("_crow"), i + 1)
                for i in range(dim)
            ]
        )
        enc_src = staged
        cell_col = F.col("_cell")
    else:
        enc_vec = v
        enc_src = df
        cell_col = cell
    # Train PQ on what it will encode (raw vectors or residuals).
    # UNCUT on purpose: pq_train memoizes the codebooks on this plan
    # (and materializes it inside the builder), so the raw and
    # residual variants — and re-runs — share trainings per corpus.
    train_df = enc_src.select(F.col(id_col).alias("_id"), enc_vec.alias("_enc"))
    books = pq_train(train_df, "_id", "_enc", m=m, k_sub=k_sub, iters=iters)
    if not books:
        idt = dict(df.dtypes).get(id_col, "bigint")
        return spark.createDataFrame([], f"{id_col} {idt}, cell int, adc_d2 double")
    ranked_rows = (
        spark.createDataFrame(
            [(cid, c) for cid, c in cents], "cell int, centroid array<double>"
        )
        .select("cell", cosine(F.col("centroid"), q).alias("cell_sim"))
        .orderBy(F.col("cell_sim").desc(), F.col("cell"))
        .collect()
    )
    n_probe = max(1, int(math.ceil(len(ranked_rows) * n_probe_fraction)))
    probe_cells = [r["cell"] for r in ranked_rows[:n_probe]]
    probed = enc_src.filter(cell_col.isin(probe_cells)).select(
        F.col(id_col), enc_vec.alias("_v"), cell_col.alias("cell")
    )
    sub = len(query_vec) // m
    vv = F.col("_v")
    cent_by_id = dict(cents)
    adc = None
    for j, book in enumerate(books):
        slice_j = F.slice(vv, j * sub + 1, sub)
        dists = F.array(*[squared_dist(slice_j, c) for _, c in book])
        idx = F.array_position(dists, F.array_min(dists)).cast("int")
        if by_residual:
            # per-probed-cell LUT: distances of the QUERY RESIDUAL's
            # j-th slice to the j-th codebook (driver doubles, same
            # fold order as the SQL twin)
            luts = {}
            for c in probe_cells:
                qres = [
                    query_vec[i] - cent_by_id[c][i] for i in range(dim)
                ]
                qs = qres[j * sub : (j + 1) * sub]
                luts[c] = [_py_squared_dist(qs, cv) for _, cv in book]
            lutmap = F.map_from_arrays(
                F.array(*[F.lit(int(c)) for c in probe_cells]),
                F.array(
                    *[
                        F.array(*[F.lit(x) for x in luts[c]])
                        for c in probe_cells
                    ]
                ),
            )
            term = F.element_at(F.element_at(lutmap, F.col("cell")), idx)
        else:
            q_slice = query_vec[j * sub : (j + 1) * sub]
            lut = F.array(
                *[F.lit(_py_squared_dist(q_slice, c)) for _, c in book]
            )
            term = F.element_at(lut, idx)
        adc = term if adc is None else adc + term
    return (
        probed.select(F.col(id_col), "cell", F.round(adc, 4).alias("adc_d2"))
        .orderBy("adc_d2", id_col)
        .limit(k)
    )


def binary_sign_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    shortlist: int = 50,
    k: int = 10,
) -> DataFrame:
    """Binary-quantized ANN with exact re-rank: each dimension becomes
    one bit (value above the corpus mean for that dimension — the
    mean-thresholded variant of sign hashing, so it works on
    non-centered embeddings), packed into 32-bit words; candidate
    ranking is codegen `bit_count(xor)` Hamming distance, and the
    `shortlist` nearest-by-Hamming vectors get exact cosine re-ranking
    for the final top-k. The 32x compression (1 bit/dim) is the
    coarsest point on the quantization ladder (float -> int8 -> PQ ->
    binary); re-ranking restores exactness of the final order over the
    shortlist.

    One aggregation for thresholds (dim driver floats), one projection
    for packing, TakeOrderedAndProject for both ranking stages — no
    shuffle of float vectors beyond the shortlist join. Deterministic:
    thresholds round to 6dp, Hamming ties break by id."""
    df = df.where(F.col(vec_col).isNotNull())
    v = as_double_array(F.col(vec_col))
    probe = df.select(vec_col).head()
    idt = dict(df.dtypes).get(id_col, "bigint")
    empty_schema = f"{id_col} {idt}, hamming int, cosine_sim double"
    if probe is None:
        return df.sparkSession.createDataFrame([], empty_schema)
    dim = len(probe[0])
    trow = df.agg(
        *[F.round(F.avg(v.getItem(i)), 6).alias(f"t{i}") for i in range(dim)]
    ).collect()[0]
    thr = [float(trow[f"t{i}"]) for i in range(dim)]
    n_words = (dim + 31) // 32
    words = []
    qwords = []
    for w in range(n_words):
        dims = range(w * 32, min(w * 32 + 32, dim))
        expr = None
        qval = 0
        for j, d in enumerate(dims):
            bit = F.when(v.getItem(d) > F.lit(thr[d]), F.lit(1 << (31 - j))).otherwise(
                F.lit(0)
            )
            expr = bit if expr is None else expr + bit
            if query_vec[d] > thr[d]:
                qval |= 1 << (31 - j)
        words.append(expr.cast("bigint").alias(f"w{w}"))
        qwords.append(qval)
    packed = df.select(F.col(id_col), v.alias("_v"), *words)
    ham = None
    for w in range(n_words):
        term = F.expr(f"bit_count(w{w} ^ {qwords[w]}L)")
        ham = term if ham is None else ham + term
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    short = (
        packed.select(F.col(id_col), F.col("_v"), ham.cast("int").alias("hamming"))
        .orderBy("hamming", id_col)
        .limit(shortlist)
    )
    return (
        short.select(
            F.col(id_col),
            "hamming",
            F.round(cosine(F.col("_v"), q), 4).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def matryoshka_rerank_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    prefix_dim: int = 16,
    shortlist: int = 50,
    k: int = 10,
) -> DataFrame:
    """Matryoshka-style two-stage retrieval (Kusupati et al., 2022,
    "Matryoshka Representation Learning"): shortlist by cosine over
    only the first ``prefix_dim`` dimensions (MRL-trained embeddings
    front-load information, so the prefix is a valid coarse embedding),
    then re-rank the shortlist with the full-dimension exact cosine.
    On untrained embeddings this is simply truncation — recall depends
    on how much signal the prefix carries — but the PLAN is the point:
    the first stage scans prefix_dim/dim of the float data (column-
    pruned at the storage layer when vectors are stored chunked), and
    the exact stage touches only `shortlist` rows.

    Both stages are TakeOrderedAndProject; deterministic ties by id."""
    df = df.where(F.col(vec_col).isNotNull())
    v = as_double_array(F.col(vec_col))
    qp = F.array(*[F.lit(float(x)) for x in query_vec[:prefix_dim]])
    qf = F.array(*[F.lit(float(x)) for x in query_vec])
    short = (
        df.select(
            F.col(id_col),
            v.alias("_v"),
            F.round(cosine(F.slice(v, 1, prefix_dim), qp), 4).alias(
                "prefix_sim"
            ),
        )
        .orderBy(F.col("prefix_sim").desc(), F.col(id_col))
        .limit(shortlist)
    )
    return (
        short.select(
            F.col(id_col),
            "prefix_sim",
            F.round(cosine(F.col("_v"), qf), 4).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def semantic_decontam(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    benchmark: DataFrame,
    bench_id_col: str,
    bench_vec_col: str,
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """Semantic decontamination: flag every corpus vector whose cosine
    to ANY benchmark vector reaches ``threshold`` — the embedding-space
    complement of the n-gram decontamination in `operators/hygiene.py`
    (n-gram screens catch verbatim leaks; embedding screens catch
    paraphrased eval items).

    Scale shape — the realistic asymmetry: eval benchmarks are small
    and fixed-size while the corpus is 100 TB, so the benchmark side
    BROADCASTS and the corpus scans ONCE; the per-row best match is a
    map-side-combined max aggregation keyed by corpus id (no shuffle
    of vectors beyond the corpus's own id partitioning). Returns
    (id, bench_id, sim) of each flagged vector's best benchmark match,
    id-ordered; anti-join the ids to drop them in a pipeline.
    """
    corpus = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    )
    bench = benchmark.where(F.col(bench_vec_col).isNotNull()).select(
        F.col(bench_id_col).alias("bench_id"),
        as_double_array(F.col(bench_vec_col)).alias("bv"),
    )
    scored = cosine_pairs_seq(
        corpus.join(F.broadcast(bench), F.lit(True)), "v", "bv", "_cos"
    ).select("id", "bench_id", F.round("_cos", 4).alias("sim"))
    best = (
        scored.groupBy("id")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("bench_id")).alias("_nb"))).alias("_m"))
        .select(
            "id",
            (-F.col("_m._nb")).alias("bench_id"),
            F.col("_m.sim").alias("sim"),
        )
    )
    return best.where(F.col("sim") >= threshold).orderBy("id")
