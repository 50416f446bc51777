"""Docs ↔ catalog sync: the README's stated catalog size, COVERAGE.md's
count claims, and every query name COVERAGE/README cite must match the
live registry — so documentation can't silently drift from the code
again (r5-r7 each caught one stale count/typo by hand)."""

from __future__ import annotations

import re
from pathlib import Path

from power_generation_etl_spark.plans import ORACLES, QUERIES

ROOT = Path(__file__).resolve().parent.parent


def _read(name: str) -> str:
    return (ROOT / name).read_text(encoding="utf-8")


def test_registry_internally_consistent():
    assert len(QUERIES) == len(ORACLES)
    assert set(QUERIES) == set(ORACLES)
    assert list(QUERIES) == list(ORACLES)  # harness pairs them by order


def test_readme_counts_match_registry():
    text = _read("README.md")
    claims = [int(x) for x in re.findall(r"registers\s+(\d+)\s+catalog\s+queries", text)]
    claims += [int(x) for x in re.findall(r"Every one of the\s+(\d+)\s+has a DuckDB", text)]
    assert claims, "README no longer states the catalog size — keep the claim"
    for c in claims:
        assert c == len(QUERIES), f"README claims {c} queries, registry has {len(QUERIES)}"


def test_coverage_counts_match_registry():
    text = _read("COVERAGE.md")
    for a, b in re.findall(r"(\d+)/(\d+)\s+oracle", text):
        assert int(a) == int(b) == len(QUERIES)
    for x in re.findall(r"\((\d+)\s+plans each\)", text):
        assert int(x) == len(QUERIES)


def test_cited_query_names_exist():
    """Every `query `name`` / `oracle `name`` citation in COVERAGE.md
    must reference a registered catalog entry (catches renames)."""
    text = _read("COVERAGE.md")
    cited = set(re.findall(r"(?:query|oracle|queries)\s+`([a-z][a-z0-9_]+)`", text))
    stale = sorted(n for n in cited if n not in QUERIES)
    assert not stale, f"COVERAGE.md cites unregistered queries: {stale}"


def test_scaling_battery_catalog_size_current():
    """SCALING_MEASURED.md's per-lineage-mode battery section must
    state the CURRENT catalog size (the battery is re-run at HEAD each
    time the catalog grows); historical anecdotes elsewhere are
    explicitly marked with the round they were measured in."""
    text = _read("SCALING_MEASURED.md")
    claims = [int(x) for x in re.findall(r"same\s+(\d+)-query\s+catalog", text)]
    assert claims, "battery section no longer states the catalog size"
    for c in claims:
        assert c == len(QUERIES), f"battery section claims {c}, registry {len(QUERIES)}"


def test_round_is_committed_and_hermetic():
    """Rotation round comes from the committed ROUND file — an
    explicit versioned input — not from untracked artifacts. The
    rotating back-21 of the first-50 sample must advance each round
    (disjoint slices round-over-round until the remainder wraps)."""
    from power_generation_etl_spark.plans import _CORE, _round_no

    committed = int(_read("ROUND").strip())
    assert _round_no() == committed >= 9

    # QUERIES is already rotated to this round's offset, so this
    # round's driver back-slice is rest[:step]; last round's slice sits
    # cyclically one step earlier, i.e. rest[-step:]. They must be
    # disjoint (guaranteed while len(rest) >= 2*step).
    rest = [k for k in QUERIES if k not in _CORE]
    step = 50 - len(_CORE)
    assert len(rest) >= 2 * step
    assert set(rest[:step]).isdisjoint(rest[-step:])


def test_core_sample_is_a_cross_section():
    """The fixed driver-sample core must stay registered and at its
    documented size; the rotating remainder covers the rest."""
    from power_generation_etl_spark.plans import _CORE

    assert 25 <= len(_CORE) <= 35  # fixed slice, rest rotates into 50
    assert len(set(_CORE)) == len(_CORE)
    missing = [n for n in _CORE if n not in QUERIES]
    assert not missing
    # the core leads the registry so first-N samplers always hit it
    assert list(QUERIES)[: len(_CORE)] == _CORE


def test_rotation_cursor_committed_and_growth_proof():
    """r10: the rotation cursor is a COMMITTED explicit input
    (ROTATION file) advanced by `plans.advance_cursor` — never
    recomputed from the round number, whose mod-len(rest) arithmetic
    re-shifts arbitrarily when the catalog grows (r9 re-sampled 9 of
    r8's 21). Simulated append-heavy histories prove the guarantee:
    once the catalog size stabilizes, every rest entry enters the
    driver's first-50 window within ceil(len(rest)/step) rounds."""
    from power_generation_etl_spark.plans import (
        _CORE,
        _rotation_cursor,
        advance_cursor,
    )

    cur = _rotation_cursor()
    assert cur is not None, "ROTATION cursor file missing/unparseable"
    rest_n = len(QUERIES) - len(_CORE)
    assert 0 <= cur < rest_n

    step = 50 - len(_CORE)

    def sampled(off, n):
        return {(off + i) % n for i in range(step)}

    # Histories: (a) frozen catalog; (b) r8→r10-like growth then frozen;
    # (c) sustained max-plausible growth (step-1 appends/round) then
    # frozen. Appends extend the tail, so indices are stable.
    for sizes in (
        [154] * 12,
        [154, 163, 183, 185] + [185] * 12,
        [100 + 20 * i for i in range(6)] + [200] * 12,
    ):
        off, seen_since_stable = 35, set()
        stable_at = next(i for i, s in enumerate(sizes) if s == sizes[-1])
        bound = -(-sizes[-1] // step)  # ceil: rounds to full coverage
        for r, n in enumerate(sizes):
            off = off % n
            if r >= stable_at:
                seen_since_stable |= sampled(off, n)
                if r - stable_at + 1 >= bound:
                    break
            off = advance_cursor(off, step, n)
        missing = set(range(sizes[-1])) - seen_since_stable
        assert not missing, (
            f"entries starved after stabilization: {sorted(missing)[:5]} "
            f"(history {sizes[:6]}...)"
        )


def test_pytest_ini_count_claims_current():
    """pytest.ini is part of the docs sweep (r10): any `N-query` claim
    it makes must match the live registry (it drifted to '173-query'
    once; it now states no number, and this keeps it honest if one
    returns)."""
    text = _read("pytest.ini")
    for x in re.findall(r"(\d+)-query", text):
        assert int(x) == len(QUERIES), f"pytest.ini claims {x}-query battery"


def test_e2e_pipeline_rows_self_consistent():
    """r10: the recorded sf0.1 e2e pipeline rows must stay internally
    consistent — modality counts summing to the input, a monotone
    shards funnel — so a future re-measure can't paste in a torn row."""
    text = _read("SCALING_MEASURED.md")
    m = re.search(
        r"(\d+) blobs \((\d+) image / (\d+) audio / (\d+) video\)", text
    )
    assert m, "prep-media e2e row missing"
    total, img, aud, vid = map(int, m.groups())
    assert img + aud + vid == total
    f = re.search(
        r"quality (\d+) → exact-dedup (\d+) → near-dup (\d+) → "
        r"decontam (\d+) → (\d+) packed sequences",
        text,
    )
    assert f, "prep-shards e2e funnel missing"
    q, e, n, d, _seq = map(int, f.groups())
    assert q >= e >= n >= d


def test_bench_ingest_doc_self_consistent():
    """r11: BENCH_INGEST.md records the ingest bench vs the reference's
    ~5min/ENTSOE-month figure. The stated corpus size must match the
    tool's default synthesis, and the recorded runs must actually
    support the stated >=2x match-or-beat verdict (so a re-measure
    can't paste in numbers that contradict the claim)."""
    text = _read("BENCH_INGEST.md")
    m = re.search(r"\*\*([\d,]+)\s*\n?\s*records\*\*", text)
    assert m, "BENCH_INGEST.md no longer states the corpus size"
    from tools.bench_ingest import HOURS

    assert int(m.group(1).replace(",", "")) == 672 * HOURS
    loads = [
        float(x)
        for x in re.findall(r"^\|\s*\d+\s*\|\s*([\d.]+)\s*\|", text, re.M)
    ]
    assert loads, "measured-run table rows missing"
    # the 2x contract vs the 300s reference budget, with headroom
    assert all(s < 150.0 for s in loads), loads
