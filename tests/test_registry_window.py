"""Registry-window hygiene: the driver checks only the FIRST 50 registered
queries, so a typo in DRIVER_PRIORITY silently wastes a correctness slot.
These tests pin (a) the window is exactly 50 real, oracle-bearing queries,
(b) the staged candidate list written into the registry comment is the
EXACT set arithmetic it claims (oracle-bearing minus driver-checked minus
the window) — the list future rounds rotate from — and (c) the
CUMULATIVE_DRIVER_GREEN figure in that comment matches the same
arithmetic (VERDICT r7 #5: no hand-maintained coverage prose)."""

from __future__ import annotations

import json
import os
import re

from code_challenge___data_engineer___machinemax_spark import plans
from code_challenge___data_engineer___machinemax_spark.plans.registry import (
    DRIVER_PRIORITY,
    _REGISTRY,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _checked_names(before_round: int | None = None) -> set[str]:
    seen: set[str] = set()
    for f in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m and (before_round is None or int(m.group(1)) < before_round):
            seen |= set(json.load(open(os.path.join(REPO, f))))
    return seen


def test_window_is_50_real_oracle_bearing_queries():
    assert len(DRIVER_PRIORITY) == 50
    oracles = plans.all_oracles()
    for n in DRIVER_PRIORITY:
        assert n in _REGISTRY, f"window names unregistered query {n!r}"
        assert n in oracles, f"window slot wasted on rows-only query {n!r}"


def test_cumulative_coverage_figure_is_machine_checked():
    """VERDICT r7 #5: the CUMULATIVE_DRIVER_GREEN figure in the registry
    comment was hand-maintained prose; pin it to the same set arithmetic
    that pins everything else in that comment. The figure is scoped
    '(before round N)' so the assertion stays true when the driver later
    writes CORRECTNESS_rN itself — the next rotation edit bumps N and the
    figure together, and THIS test goes red if either is forgotten."""
    src = open(
        os.path.join(
            REPO,
            "code_challenge___data_engineer___machinemax_spark",
            "plans",
            "registry.py",
        )
    ).read()
    m = re.search(
        r"# CUMULATIVE_DRIVER_GREEN \(before round (\d+)\): (\d+) of (\d+)", src
    )
    assert m, "registry comment lost its CUMULATIVE_DRIVER_GREEN line"
    oracles = set(plans.all_oracles())
    assert int(m.group(2)) == len(_checked_names(before_round=int(m.group(1))) & oracles)
    assert int(m.group(3)) == len(oracles)


def _last_driver_round(before_round: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m and int(m.group(1)) < before_round:
            for k in json.load(open(os.path.join(REPO, f))):
                last[k] = max(last.get(k, 0), int(m.group(1)))
    return last


def test_recert_slots_follow_oldest_first_rule():
    """VERDICT r8 #3: the re-cert rotation rule is machine-pinned, not
    prose. The window must be: [2 sentinels] + [every oracle-bearing
    query with no driver row, alphabetical] + [already-certified queries
    ordered by OLDEST last-driver-row first, ties alphabetical] until 50.
    Scoped to CORRECTNESS files before the round named in the registry's
    CUMULATIVE_DRIVER_GREEN line, so the assertion stays true after the
    driver writes this round's own file; the next rotation edit bumps the
    round and recomputes — and THIS test goes red if the recompute is
    skipped or hand-ordered."""
    src = open(
        os.path.join(
            REPO,
            "code_challenge___data_engineer___machinemax_spark",
            "plans",
            "registry.py",
        )
    ).read()
    m = re.search(r"# CUMULATIVE_DRIVER_GREEN \(before round (\d+)\)", src)
    assert m
    before = int(m.group(1))
    oracles = set(plans.all_oracles())
    last = {q: r for q, r in _last_driver_round(before).items() if q in oracles}
    sentinels = DRIVER_PRIORITY[:2]
    assert sentinels == ["q1_pricing_summary", "keyword_search_hit"]
    never = oracles - set(last)
    # queries added AFTER this window froze are staged for the next
    # rotation (candidate comment, tested below), not in this window
    never_in_window = sorted(never & set(DRIVER_PRIORITY))
    assert DRIVER_PRIORITY[2 : 2 + len(never_in_window)] == never_in_window
    pool = sorted(
        (q for q in last if q not in sentinels),
        key=lambda q: (last[q], q),
    )
    n_recert = 50 - 2 - len(never_in_window)
    assert DRIVER_PRIORITY[2 + len(never_in_window) :] == pool[:n_recert]


def test_candidate_comment_matches_set_arithmetic():
    src = open(
        os.path.join(
            REPO,
            "code_challenge___data_engineer___machinemax_spark",
            "plans",
            "registry.py",
        )
    ).read()
    block = src[src.index("# Next-rotation window candidates") :]
    block = block[: block.index("]")]
    listed = set(re.findall(r"[a-z0-9_]+", block.replace("# ", " ")))
    listed = {n for n in listed if n in _REGISTRY}
    computed = set(plans.all_oracles()) - _checked_names() - set(DRIVER_PRIORITY)
    assert listed == computed, (
        f"comment drift: missing {sorted(computed - listed)[:5]}, "
        f"stale {sorted(listed - computed)[:5]}"
    )
