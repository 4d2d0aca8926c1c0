"""The window-rotation tool is load-bearing process machinery (the driver
hashes only the first 50 PRIORITY_ORDER entries per round), so its green-row
parsing and ordering rules get pinned here. No Spark needed."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from rotate_window import last_green_round


def test_last_green_round_takes_max_green_and_skips_failures(tmp_path):
    r1 = {
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
    }
    r2 = {
        "a": {"rows_match": True, "schema_match": True, "hash_match": True, "err": None},
        "b": {"rows_match": False, "schema_match": True, "hash_match": False, "err": None},
        "c": {"rows_match": True, "schema_match": True, "hash_match": True, "err": "boom"},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    g = last_green_round(str(tmp_path))
    assert g["a"] == 2          # re-hashed green later -> max round wins
    assert g["b"] == 1          # r2 failure does not erase the r1 green
    assert "c" not in g         # an errored row is never green


def test_rows_only_rows_count_as_green(tmp_path):
    # oracle-less queries record rows_match without hash_match
    r3 = {"s": {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}}
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(r3))
    assert last_green_round(str(tmp_path)) == {"s": 3}


def test_current_window_reaches_full_hash_parity():
    """The r9 contract: window = every never-hashed query + the round's new
    registrations + freshness re-hashes — so after the r9 driver run, every
    registered query has at least one green driver row."""
    from pulsar_3_2_codedump_spark.queries import PRIORITY_ORDER, load_all

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    greens = last_green_round(repo)
    registry = load_all()
    assert list(registry) == PRIORITY_ORDER[: len(registry)]  # order intact
    window = set(PRIORITY_ORDER[:50])
    never_hashed = {n for n in registry if n not in greens}
    assert never_hashed <= window, sorted(never_hashed - window)
