"""Capture .explain("formatted") output for declared queries.

Usage:
    python tools/capture_plans.py <tag> [query ...]

Writes plans/r15/<query>_<tag>.txt for each named query (default: the
bench tail list below). The query function is CALLED (plans only — no
noop run), so integration gates that build stores eagerly will pay
their build; run at a small sf via SPARK_GRAFT_SF_DIR when that matters.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bgg_data_warehouse_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    if not names:
        names = list(qs)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        if n not in qs:
            print(f"skip {n}: not registered")
            continue
        try:
            df = qs[n](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# query: {n}\n# sf_dir: {sf_dir}\n\n{text}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
