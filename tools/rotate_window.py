"""Compute the next round's 50-slot verification window mechanically.

The driver hashes only the FIRST 50 entries of ``queries.py::PRIORITY_ORDER``
each round, so the window must rotate (policy documented above the boundary
comment in queries.py):

  1. queries whose code changed since their last green driver hash
     (passed via --changed; git history knows, this tool can't)
  2. new registrations (never seen in any CORRECTNESS_r*.json)
  3. freshness re-hashes: oldest last-green round first, ties broken by
     current PRIORITY_ORDER position

Reads every CORRECTNESS_r*.json in the repo root, prints the recommended
window plus the full rotated PRIORITY_ORDER body to paste into queries.py.

Usage: python tools/rotate_window.py [--changed name1,name2] [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green_round(repo: str) -> dict[str, int]:
    """name -> highest round with a fully-green driver row (hash or, for
    oracle-less rows, rows_match with no error)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True) is not False
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", default="", help="comma-separated query names whose code changed since their last green hash")
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()
    changed = [c for c in args.changed.split(",") if c]

    from pulsar_3_2_codedump_spark.queries import PRIORITY_ORDER, load_all

    registry = load_all()
    unknown = [c for c in changed if c not in registry]
    if unknown:
        sys.exit(f"--changed names not registered: {unknown}")
    greens = last_green_round(REPO)
    pos = {n: i for i, n in enumerate(PRIORITY_ORDER)}
    # candidates come from the REGISTRY, not PRIORITY_ORDER (r13 fix: a
    # new registration not yet pasted into queries.py was invisible to
    # the 'never driver-hashed' bucket — exactly the queries the window
    # must include); names only in PRIORITY_ORDER (deregistered) drop out
    names = sorted(registry, key=lambda n: pos.get(n, len(pos)))

    never = [n for n in names if n not in greens and n not in changed]
    fresh = sorted(
        (n for n in names if n in greens and n not in changed),
        key=lambda n: (greens[n], pos.get(n, len(pos))),
    )
    if len(changed) + len(never) > args.window:
        sys.exit(
            f"ERROR: {len(changed)} changed + {len(never)} never-hashed queries "
            f"exceed the {args.window}-slot window — some would silently fall "
            f"below the boundary, violating the policy in queries.py. Split "
            f"across rounds explicitly (or raise --window if the driver's "
            f"window actually grew)."
        )
    window = (changed + never + fresh)[: args.window]
    tail = [n for n in PRIORITY_ORDER if n not in set(window)]

    print(f"# changed (code edited since last green hash): {len(changed)}")
    print(f"# never driver-hashed: {len(never)}  -> {never if never else '[]'}")
    print(f"# freshness re-hashes filling the window: {args.window - len(changed) - len(never)}")
    print(f"# oldest greens entering: {[ (n, greens[n]) for n in window if n in greens ][:8]}")
    print()
    print("PRIORITY_ORDER = [")
    for block, label in ((window, f"---- rotation window ({args.window}) ----"), (tail, "standing-green tail")):
        for n in block:
            print(f'    "{n}",')
        if block is window:
            print(f"    # ---- rotation window boundary ({args.window}) ----")
    print("]")


if __name__ == "__main__":
    main()
