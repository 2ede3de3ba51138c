#!/usr/bin/env python
"""Dump .explain("formatted") for gate queries to plans/r15/<q>_<tag>.txt.

Usage: python scripts/r15_plans.py <tag> <query> [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    from jetro_spark.session import get_spark
    from jetro_spark.gate import all_queries

    spark = get_spark("r15_plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", name, tag)


if __name__ == "__main__":
    main()
