"""Dump ``explain("formatted")`` for named queries to files (round-12
optimization deliverable: plans/r12/<query>_{before,after}.txt).

Usage: python tools/_r12_plans.py --out plans/r12 --suffix after [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from mahout_samsara_book_spark.cache import release_tracked  # noqa: E402
from mahout_samsara_book_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir, suffix = "plans/r12", "after"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark(app_name="r12_plans")
    q = entry.queries()
    for name in names:
        df = q[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out_dir}/{name}_{suffix}.txt", flush=True)
        release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
