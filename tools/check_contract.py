"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, compares row count,
column names/types, and an order-insensitive value multiset.
Queries without oracle SQL get a rows-only check (like the driver).

Also checks ``extra_queries()``/``extra_oracle_sql()`` — the twin
gates kept out of the driver registry to respect its 50-row cap.

Usage: python3 tools/check_contract.py [--no-extras] [names...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from neosearch_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def canon_type(t: str) -> str:
    """Canonical type-class (int/float/str/bool/ts) — name-only
    matching would hide a string '42' vs BIGINT 42 divergence that
    stringified values compare equal.  Shared with the pytest twin
    gates (tests/test_extra_gates.py) so the two evidence paths can
    never apply different comparisons."""
    t = t.lower()
    for cls, keys in (
        ("int", ("tinyint", "smallint", "int", "bigint", "long", "hugeint")),
        ("float", ("float", "double", "real", "decimal")),
        ("bool", ("bool",)),
        ("ts", ("timestamp", "date")),
        ("str", ("string", "varchar", "char", "text")),
    ):
        if any(k in t for k in keys):
            return cls
    return t


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--no-extras"]
    with_extras = "--no-extras" not in sys.argv[1:]
    only = set(argv)
    spark = get_spark("contract_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if with_extras:
        qs = {**qs, **entrymod.extra_queries()}
        oracles = {**oracles, **entrymod.extra_oracle_sql()}
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not yield a false-green "all checks
        # passed" with nothing run
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            status = f"rows-only ({len(srows)} rows)"
            if len(srows) == 0:
                status += "  [WARN: empty]"
            print(f"ok?   {name}: {status}  {time.time()-t0:.1f}s")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            stypes = {c.lower(): canon_type(t) for c, t in sdf.dtypes}
            otypes = {
                c.lower(): canon_type(str(t))
                for c, t in zip(rel.columns, rel.types)
            }
            mismatch = {
                c: (stypes[c], otypes[c])
                for c in stypes
                if stypes[c] != otypes.get(c)
            }
            if mismatch:
                problems.append(f"dtype {mismatch}")
        if not problems:
            sk, ok = rows_key(scols, srows), rows_key(ocols, orows)
            if sk != ok:
                for i, (a, b) in enumerate(zip(sk, ok)):
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} oracle={b}")
                        break
                else:
                    problems.append("value diff (length mismatch after sort?)")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name}  ({len(srows)} rows, {time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[n for n, _ in failures]}")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
