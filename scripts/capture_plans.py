"""Capture .explain('formatted') for bench headline queries.

Usage: python scripts/capture_plans.py <outdir> [name_filter...]

Writes <outdir>/<query>.txt with the formatted physical plan for each
bench HEADLINE entry (or the filtered subset). The optimization-round
evidence artifact: plans/r13/<q>_before.txt / _after.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    flt = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from clickhouse_observability_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # r14: the optimization targets include common-48 entries outside
    # HEADLINE — capture any registered query whose name matches.
    names = [name for name, _mode in HEADLINE]
    names += [n for n in sorted(qs) if n not in names]
    for name in names:
        if flt and not any(f in name for f in flt):
            continue
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}")


if __name__ == "__main__":
    main()
