"""Local stand-in for the driver's t2 duckdb-oracle check.

Runs every __spark_entry__.queries() entry at the given SF alongside its
oracle_sql() in DuckDB; compares row count, column names, values
(columns sorted by name, rows sorted; floats both exactly and at 1e-9
tolerance so near-misses are visible) AND coarse column dtypes — the
driver's value hash is dtype-sensitive (a DuckDB DECIMAL sum against a
Spark BIGINT hash-mismatches even when every value is equal; that was
q_pack_sequences in r03), so an un-cast aggregate must fail HERE, not in
the round report.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys

try:  # installed package (editable: python setup.py develop / pip install -e)
    import bigdatalog_spark  # noqa: F401
except ImportError:  # fall back to running from a source checkout
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# __spark_entry__ lives at the repo root, not in the package
import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def norm_cell(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def rows_key(rows):
    # None sorts before any value (mixed-type-safe: key on type name first)
    def cell_key(c):
        return (c is not None, type(c).__name__, c if c is not None else 0)

    return sorted(
        (tuple(norm_cell(c) for c in r) for r in rows),
        key=lambda r: tuple(cell_key(c) for c in r),
    )


def coarse_type(t: str) -> str:
    """Collapse engine-specific type names to the classes the driver's
    dtype-sensitive hash distinguishes: int / float / DECIMAL (the classic
    silent killer) / string / bool / date / timestamp / list."""
    t = str(t).lower()
    if "decimal" in t:
        return "decimal"
    if any(k in t for k in ("int", "long", "short", "byte")):
        return "int"
    if any(k in t for k in ("float", "double", "halffloat")):
        return "float"
    if "timestamp" in t:
        return "timestamp"
    if "date" in t:
        return "date"
    if any(k in t for k in ("string", "varchar", "utf8", "char")):
        return "string"
    if "bool" in t:
        return "bool"
    if any(k in t for k in ("list", "array")):
        return "list"
    return t


def approx_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for ca, cb in zip(ra, rb):
            if isinstance(ca, float) and isinstance(cb, float):
                if not math.isclose(ca, cb, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif ca != cb:
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from bigdatalog_spark import build_session

    spark = build_session(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(r[c] for c in scols) for r in sdf.collect()
            ]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({spark_t:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols_raw = [d[0] for d in res.description]
            orows_raw = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            failures.append(name)
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [tuple(r[i] for i in order) for r in orows_raw]
        status = []
        if scols != ocols:
            status.append(f"SCHEMA spark={scols} oracle={ocols}")
        else:
            # dtype gate: Arrow schema of a LIMIT-0 oracle run vs the Spark
            # schema, collapsed to the driver-relevant coarse classes
            try:
                oarrow = con.execute(
                    f"SELECT * FROM ({oracles[name]}) LIMIT 0"
                ).arrow()
                otypes = {f.name: coarse_type(f.type) for f in oarrow.schema}
                stypes = {
                    f.name: coarse_type(f.dataType.simpleString())
                    for f in sdf.schema.fields
                }
                bad = [
                    f"{c}: spark={stypes[c]} oracle={otypes[c]}"
                    for c in scols
                    if stypes.get(c) != otypes.get(c)
                ]
                if bad:
                    status.append(f"DTYPE {'; '.join(bad)}")
            except Exception as e:  # arrow probe is best-effort
                print(f"  (dtype probe skipped for {name}: {str(e)[:80]})")
        if len(srows) != len(orows):
            status.append(f"COUNT spark={len(srows)} oracle={len(orows)}")
        if not status:
            a, b = rows_key(srows), rows_key(orows)
            if a == b:
                pass
            elif approx_equal(a, b):
                status.append("VALUES approx-equal only (float jitter)")
            else:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"VALUES differ, e.g. {diffs}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows ({spark_t:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
