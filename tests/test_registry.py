"""Registry invariants: the contract documents' tallies may not drift
from the actual registry, and the curated sample-window head may not
contain duplicates (a duplicate silently shrinks the ~50-query budget
the driver spends on unconfirmed queries)."""

from __future__ import annotations

import os

from pulsar_lunar_spark.queries import all_queries
from pulsar_lunar_spark.queries.registry import _DRIVER_CONFIRMED, _NEWEST_FIRST

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_tallies_match_registry():
    n = len(all_queries())
    for fname, needle in (
        ("COVERAGE.md", f"{n} queries"),
        ("README.md", f"{n} queries"),
        ("SURVEY.md", f"{n} registered queries"),
    ):
        with open(os.path.join(REPO, fname)) as f:
            assert needle in f.read(), f"{fname}: stale tally (registry has {n})"


def test_newest_first_has_no_duplicates():
    assert len(set(_NEWEST_FIRST)) == len(_NEWEST_FIRST)


def test_newest_first_and_confirmed_disjoint():
    # a confirmed query in the head would waste sample budget
    overlap = set(_NEWEST_FIRST) & _DRIVER_CONFIRMED
    assert not overlap, f"confirmed queries in _NEWEST_FIRST: {sorted(overlap)}"


def test_confirmed_names_exist():
    names = set(all_queries())
    missing = _DRIVER_CONFIRMED - names
    assert not missing, f"confirmed-but-unregistered: {sorted(missing)}"


def test_newest_first_names_exist():
    # a typo'd name here silently vanishes from the driver's sample
    # window (all_queries() filters by registered specs) — make it loud
    names = set(all_queries())
    missing = set(_NEWEST_FIRST) - names
    assert not missing, f"curated-but-unregistered: {sorted(missing)}"


def test_sf_cache_tag_distinguishes_same_basename(tmp_path):
    # two sf_dirs sharing a basename must never share a fixture-cache
    # slot (a topic produced from one dataset silently serving the other)
    from pulsar_lunar_spark.session import sf_cache_tag

    a = tmp_path / "x" / "sf0.01"
    b = tmp_path / "y" / "sf0.01"
    a.mkdir(parents=True)
    b.mkdir(parents=True)
    assert sf_cache_tag(str(a)) != sf_cache_tag(str(b))
    # stable for the same resolved path, trailing slash or not
    assert sf_cache_tag(str(a)) == sf_cache_tag(str(a) + "/")


def test_sample_head_leads_with_unconfirmed():
    # the first 50 registry entries (the driver's sample window) must all
    # be queries without a driver-green row yet
    head = list(all_queries())[:50]
    confirmed_in_head = [n for n in head if n in _DRIVER_CONFIRMED]
    assert not confirmed_in_head
