"""Dump ``explain("formatted")`` for named queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
Default query set: bench HEADLINE + SECONDARY. The judge checks plan claims
in OPTIMIZATION_r*.md against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SECONDARY
from pulsar_3_2_codedump_spark.catalog import release_shared_frames
from pulsar_3_2_codedump_spark.queries import load_all
from pulsar_3_2_codedump_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or (HEADLINE + SECONDARY)
    registry = load_all()
    spark = get_spark("dump_plans")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        release_shared_frames()
        df = registry[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
