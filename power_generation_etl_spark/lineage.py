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
  (MEMORY_AND_DISK) OOM'd an 8 GiB driver 104 queries into a full
  catalog battery (r7, 173 queries at the time); on-disk blocks cost
  a read but bound heap usage.
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

import contextlib
import os
import tempfile
import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_ENV = "SPARK_ETL_LINEAGE_CUT"
_MODES = ("local", "persist", "checkpoint")


def mode() -> str:
    m = os.environ.get(_ENV, "local")
    if m not in _MODES:
        raise ValueError(f"{_ENV} must be one of {_MODES}, got {m!r}")
    return m


def _local_master(df: DataFrame) -> bool:
    """True when the session runs single-machine (master local[N]) —
    there, a driver-local temp dir IS visible to every "executor"
    thread, so it is a valid reliable-checkpoint target. On any other
    master the same path would be per-node-private storage."""
    try:
        return df.sparkSession.sparkContext.master.startswith("local")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Pin scopes: precise attribution of the blocks a build pins.
#
# `memo.PlanMemo.get_or_build` used to attribute persisted RDDs to a
# build by diffing the GLOBAL getPersistentRDDs() map around the whole
# build — which captured anything persisted concurrently (another
# thread, a NESTED memoized build, unrelated caching) and later
# eagerly unpersisted it out from under its real owner. Instead, every
# `cut`/`cut_index` call now registers the RDD ids IT created into the
# innermost active pin scope: the diff window shrinks from "the whole
# build" to "one materialization", runs under a module lock so
# concurrent cuts can't cross-attribute, and nested scopes (a memoized
# build inside a memoized build) each collect only their own cuts.
# The scope stack is THREAD-LOCAL: a cut on thread B must never
# register into thread A's open scope (A's eviction would then
# unpersist B's live blocks — the exact cross-attribution bug this
# design removes). Non-cut persists from the same thread inside the
# narrow locked diff window remain theoretically attributable — the
# catalog is single-threaded per session, and the worst case for
# persist-backed blocks is a recompute (lineage retained), never data
# loss.
# ---------------------------------------------------------------------------
_PIN_TLS = threading.local()
_PIN_LOCK = threading.Lock()


def _scopes() -> list[set[int]]:
    stack = getattr(_PIN_TLS, "stack", None)
    if stack is None:
        stack = _PIN_TLS.stack = []
    return stack


@contextlib.contextmanager
def pin_scope():
    """Collect the RDD ids pinned by `cut`/`cut_index` calls made while
    the scope is this thread's innermost active one. Yields the
    (mutating) set."""
    ids: set[int] = set()
    stack = _scopes()
    stack.append(ids)
    try:
        yield ids
    finally:
        # pop by IDENTITY, never equality: two empty scopes compare
        # equal, and list.remove would pop the wrong (outer) one
        for i in range(len(stack) - 1, -1, -1):
            if stack[i] is ids:
                del stack[i]
                break


def _persistent_ids(df: DataFrame) -> set[int]:
    try:
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}
    except Exception:
        return set()


def _materialize_registered(df: DataFrame, materialize) -> DataFrame:
    """Run one lineage-cut materialization, registering any newly
    persisted RDD ids into THIS THREAD's innermost pin scope (no-op
    when no scope is active — zero overhead outside memoized builds)."""
    stack = _scopes()
    if not stack:
        # still serialize with scoped cuts: an unscoped cut's new RDD
        # ids must not land inside another thread's open diff window
        with _PIN_LOCK:
            return materialize(df)
    with _PIN_LOCK:
        before = _persistent_ids(df)
        out = materialize(df)
        new = _persistent_ids(df) - before
    stack[-1].update(new)
    return out


def cut_index(df: DataFrame) -> DataFrame:
    """Materialize a REUSED INDEX PRODUCT — a table probed by many
    later fine-grained jobs (the suffix family's tokenized base and
    doubling rank levels).

    local → localCheckpoint (same as `cut`). persist → RELIABLE
    checkpoint when one is actually available, because under persist
    each level's retained plan nests the previous level, so level k is
    an O(k)-deep tree and the LCP descent's per-level probe jobs
    re-analyze O(levels²) plan nodes on the driver — measured 69s vs
    12.6s for the sf0.1 `longest_repeated_substrings`
    (SCALING_MEASURED.md, r8). A reliable checkpoint truncates the
    plan while STRENGTHENING recoverability (survives any executor
    loss, not just recompute-on-loss).

    "Available" respects persist mode's deployment contract — persist
    is the mode that promises to need NO shared cluster storage:

    * a checkpoint dir is already configured → use it (the deployment
      opted into shared storage; `setCheckpointDir("hdfs://…")` at
      bootstrap).
    * no dir, master is local[N] → a driver temp dir is genuinely
      shared (one machine), so configure one and checkpoint.
    * no dir, real cluster → **fall back to plain `cut` (persist +
      count)**. A driver-local mkdtemp here would make executors write
      checkpoint partitions to their own private /tmp and later
      cross-node reads fail — invisible on local[N], fatal in the
      deployments persist targets. The cost of the fallback is the
      documented O(levels²) driver-side plan re-analysis for
      suffix-family index products (results stay correct, levels are
      log-bounded); deployments that want the fast path configure
      shared checkpoint storage at bootstrap.

    checkpoint mode → reliable checkpoint (unchanged).
    """
    if mode() == "persist":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None and _local_master(df):
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-etl-ckpt-"))
        if sc.getCheckpointDir() is not None:
            return _materialize_registered(df, lambda d: d.checkpoint(eager=True))
        return cut(df)
    return cut(df)


def cut(df: DataFrame) -> DataFrame:
    """Materialize `df` and return a DataFrame safe to iterate on.

    Semantically the identity; physically one of localCheckpoint /
    persist+count / reliable checkpoint per the module docstring.
    """
    m = mode()
    if m == "persist":
        def _persist(d: DataFrame) -> DataFrame:
            out = d.persist(StorageLevel.DISK_ONLY)
            out.count()  # materialize eagerly, like localCheckpoint(eager=True)
            return out

        return _materialize_registered(df, _persist)
    if m == "checkpoint":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            if not _local_master(df):
                raise RuntimeError(
                    f"{_ENV}=checkpoint on a non-local master requires a "
                    "SHARED checkpoint directory: call spark.sparkContext."
                    "setCheckpointDir('hdfs://…' or 's3://…') during "
                    "session bootstrap. (A driver-local temp dir would "
                    "leave each executor's checkpoint partitions on its "
                    "own node — unreadable from the rest of the cluster.)"
                )
            # local[N] fallback so the mode is testable without cluster
            # storage: on one machine a driver temp dir IS shared.
            sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-etl-ckpt-"))
        return _materialize_registered(df, lambda d: d.checkpoint(eager=True))
    return _materialize_registered(df, lambda d: d.localCheckpoint())
