"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet, and
compares row count + sorted-by-name columns + order-insensitive values.

Faithful to the driver's canonicalization (learned in round 1):
both sides go through **pandas** (`toPandas()` / `.df()`), columns are
sorted by name, then rows are `sort_values`-sorted over all columns.
Consequences this reproduces that plain-Python comparison misses:

- a list-typed output column raises ``TypeError: unhashable type`` in
  ``sort_values`` (the driver records this as a hard err) — graded
  outputs must JSON-render arrays;
- DuckDB HUGEINT (``count_if``, windowed ``SUM`` of ints) becomes
  float64 in pandas, so ``3.0`` != Spark's int64 ``3`` — oracle SQL
  must CAST those to BIGINT.

Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _cell(v) -> str:
    """Render one pandas cell the way the driver's value-hash sees it."""
    import pandas as pd

    if v is None:
        return "NULL"
    if hasattr(v, "item"):  # numpy scalar → python scalar, keeps int/float split
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # int64 3 renders '3'; float64 renders '3.0' — distinct
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_pdf(pdf):
    """Driver-style canonicalization: sort columns by name, sort_values over
    ALL columns (raises on unhashable cells, as the driver does), render."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return ["|".join(_cell(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)]


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from bgg_data_warehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single-file tables; generated fixtures (e.g. the
        # skew-audit dirs under /tmp/spark_graft_skew) are Spark-written
        # DIRECTORIES — glob those so the same oracle gate runs on both.
        # Recursive glob + hive_partitioning so a PARTITIONED Spark table
        # dir (profile=X/ subdirs from io.LAYOUTS) also reads correctly,
        # not just flat single-level dirs.
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            src = os.path.join(p, "**", "*.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{src}', hive_partitioning = true)"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            pdf_s = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            # the driver still canonicalizes rows-only entries — a list
            # column would hard-err there too, so check it here
            try:
                canon_pdf(pdf_s)
            except Exception as e:
                failures.append(name)
                print(f"FAIL  {name}: rows-only canon raised {type(e).__name__}: {e}")
                continue
            print(f"ok    {name}: rows-only ({len(pdf_s)} rows)")
            continue
        try:
            pdf_d = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            continue
        problems = []
        if len(pdf_s) != len(pdf_d):
            problems.append(f"rowcount spark={len(pdf_s)} duck={len(pdf_d)}")
        if sorted(pdf_s.columns) != sorted(pdf_d.columns):
            problems.append(
                f"columns spark={sorted(pdf_s.columns)} duck={sorted(pdf_d.columns)}"
            )
        if not problems:
            try:
                s = canon_pdf(pdf_s)
            except Exception as e:
                problems.append(f"spark canon raised {type(e).__name__}: {e}")
                s = d = None
            if not problems:
                try:
                    d = canon_pdf(pdf_d)
                except Exception as e:
                    problems.append(f"oracle canon raised {type(e).__name__}: {e}")
                    d = None
            if not problems and s != d:
                diff = [(a, b) for a, b in zip(s, d) if a != b][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(pdf_s)} rows match oracle")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
