"""Session-scoped memoization of per-corpus derived products.

A catalog session typically runs MANY operators over the same corpus:
the near-dup family alone builds the same distinct-shingle table seven
times (exact Jaccard, containment, MinHash-LSH, SimHash, AllPairs
prefix filter, and the two graph queries that start from Jaccard
pairs), and both suffix-family operators need the same tokenized base
and doubling rank tables. Each build materializes via `lineage.cut`,
so rebuilding is pure waste — the 100 TB analogue is "train/build the
index once, query it many times".

`PlanMemo` caches the built product keyed by the SOURCE PLAN identity
plus explicit parameters. The plan key — `DataFrame.semanticHash()`
pre-filter + `sameSemantics()` confirm — is exact in the direction
that matters: two reads of the same parquet path compare equal, while
different paths and different `createDataFrame` literal data never do,
so a stale hit cannot happen; the worst case is a harmless rebuild
(e.g. LocalRelations never match, so unit-test corpora always build
fresh). Entries pin materialized blocks in executor storage, so each
memo is LRU-capped; evicted entries drop their Python refs and the
ContextCleaner reclaims the blocks.

Caveat (documented, not detectable from the plan): overwriting a
parquet path IN-SESSION and re-deriving products from it would hit the
stale cache — disable with the env switch for such workflows. The
catalog only ever reads immutable testdata/warehouse snapshots.
"""

from __future__ import annotations

import os
from typing import Any, Callable

from pyspark.sql import DataFrame

_DEFAULT_ENV = "SPARK_ETL_PRODUCT_CACHE"


class PlanMemo:
    """LRU memo of products derived from a source DataFrame plan."""

    def __init__(self, name: str, cap: int = 4, env: str = _DEFAULT_ENV):
        self.name = name
        self.cap = cap
        self.env = env
        self._slots: list[tuple[tuple, DataFrame, Any]] = []

    def enabled(self) -> bool:
        return os.environ.get(self.env, "1") != "0"

    def get_or_build(
        self, key: tuple, src: DataFrame, build: Callable[[], Any]
    ) -> Any:
        """The cached product for (key, src-plan), else build(), cache,
        and return it. `key` carries every non-plan parameter that
        shapes the product (shingle n, k-means k/iters/kernel, ...)."""
        if not self.enabled():
            return build()
        h = (key, src.semanticHash())
        for i, (kh, sdf, prod) in enumerate(self._slots):
            if kh == h and src.sameSemantics(sdf):
                self._slots.append(self._slots.pop(i))  # LRU bump
                return prod
        prod = build()
        self._slots.append((h, src, prod))
        del self._slots[: -self.cap]
        return prod
