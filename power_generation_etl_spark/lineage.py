"""Pluggable lineage-cut strategy for iterative operators.

Iterative DataFrame algorithms (prefix doubling in `operators/
suffix.py`, label propagation / PageRank / k-core peeling in
`operators/graph.py`, the two-pass ranks in `operators/rank.py`,
BPE training in `operators/bpe.py`) must materialize each round's
result — otherwise the logical plan nests one full copy of itself per
round and analysis goes quadratic. HOW to materialize is a deployment
decision, not an algorithm decision:

* ``local`` (default) — ``DataFrame.localCheckpoint()``: blocks pinned
  to the executors that computed them, zero extra I/O. The right call
  on local[N] and on static clusters, but the lineage truncation means
  an executor loss makes those blocks unrecoverable — with dynamic
  allocation or spot instances a 16-round suffix-array build can die
  at round 15.
* ``persist`` — ``persist(DISK_ONLY)`` + an eager ``count()``: lineage
  is kept, so a lost block recomputes from the (bounded,
  already-cut-upstream) parent — the retained lineage, not the storage
  tier, is what makes the mode recoverable. DISK_ONLY deliberately:
  long catalog sessions accumulate hundreds of cut tables faster than
  the ContextCleaner reclaims them, and deserialized in-heap blocks
  (MEMORY_AND_DISK) OOM'd an 8 GiB driver 104 queries into the
  173-query battery; on-disk blocks cost a read but bound heap usage.
  The per-round plan still references its parent, so round counts must
  stay bounded (they are: every iterative operator here is fixed-round
  or log-round).
* ``checkpoint`` — ``DataFrame.checkpoint()``: a RELIABLE checkpoint
  to ``spark.sparkContext.getCheckpointDir`` (HDFS/S3 on a real
  cluster). Survives any executor loss; costs a write+read of the
  round's output. The 100 TB default on clusters with dynamic
  allocation.

Select with ``SPARK_ETL_LINEAGE_CUT=local|persist|checkpoint`` (env,
read per call so tests can flip it). All three produce identical
results — `tests/test_lineage.py` asserts it on iterative fixtures —
because a lineage cut is semantically the identity.
"""

from __future__ import annotations

import os
import tempfile

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_ENV = "SPARK_ETL_LINEAGE_CUT"
_MODES = ("local", "persist", "checkpoint")


def mode() -> str:
    m = os.environ.get(_ENV, "local")
    if m not in _MODES:
        raise ValueError(f"{_ENV} must be one of {_MODES}, got {m!r}")
    return m


def cut_index(df: DataFrame) -> DataFrame:
    """Materialize a REUSED INDEX PRODUCT — a table probed by many
    later fine-grained jobs (the suffix family's tokenized base and
    doubling rank levels).

    local → localCheckpoint (same as `cut`). persist → RELIABLE
    checkpoint, deliberately: under persist each level's retained plan
    nests the previous level, so level k is an O(k)-deep tree and the
    LCP descent's per-level probe jobs re-analyze O(levels²) plan
    nodes on the driver — measured 69s vs 12.6s for the sf0.1
    `longest_repeated_substrings` (SCALING_MEASURED.md, r8). A
    reliable checkpoint truncates the plan while STRENGTHENING
    recoverability (survives any executor loss, not just
    recompute-on-loss), so the persist mode's deployment contract is
    preserved for these products. checkpoint → checkpoint (unchanged).
    """
    if mode() == "persist":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-etl-ckpt-"))
        return df.checkpoint(eager=True)
    return cut(df)


def cut(df: DataFrame) -> DataFrame:
    """Materialize `df` and return a DataFrame safe to iterate on.

    Semantically the identity; physically one of localCheckpoint /
    persist+count / reliable checkpoint per the module docstring.
    """
    m = mode()
    if m == "persist":
        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # materialize eagerly, like localCheckpoint(eager=True)
        return out
    if m == "checkpoint":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            # Local fallback so the mode is testable without cluster
            # storage; real deployments call setCheckpointDir("hdfs://...")
            # or ("s3://...") during session bootstrap.
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-etl-ckpt-"))
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
