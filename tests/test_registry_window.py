"""The external-verification window invariant: the driver checks only the
FIRST 50 registered queries, so every query that has never appeared in a
CORRECTNESS round must be registered inside that window (r05→r06 lesson:
a new registration in an early module silently pushed the tail out)."""

from __future__ import annotations

import glob
import json
import os

from edgy_spark.catalog import QUERIES, R14_WINDOW, load_all_registrations

load_all_registrations()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _ever_checked() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names |= set(json.load(f))
    return names


def test_never_verified_queries_sit_inside_the_driver_window():
    checked = _ever_checked()
    if not checked:  # fresh clone without round artifacts: nothing to pin
        return
    names = list(QUERIES)
    stranded = [n for n in names[WINDOW:] if n not in checked]
    assert not stranded, (
        f"{stranded} have never been driver-verified but sit outside the "
        f"first-{WINDOW} window — add them to _prioritize() in catalog.py"
    )


def test_first_50_registrations_match_the_intended_window_exactly():
    """The verdict's window-rotation guard: the first WINDOW registrations
    must equal the explicit intended list, position for position — so a
    future module reorder or early registration cannot silently evict an
    entry the round's rotation plan depends on."""
    assert len(R14_WINDOW) == WINDOW
    assert len(set(R14_WINDOW)) == WINDOW, "duplicates in the window list"
    names = list(QUERIES)[:WINDOW]
    assert names == R14_WINDOW, (
        "driver window drifted from the plan: "
        f"unexpected={sorted(set(names) - set(R14_WINDOW))} "
        f"evicted={sorted(set(R14_WINDOW) - set(names))}"
    )


def test_every_query_has_a_full_value_oracle():
    missing = [n for n, s in QUERIES.items() if not s.oracle]
    assert not missing, f"rows-only queries (no DuckDB oracle): {missing}"
