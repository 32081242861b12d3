"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and an order-insensitive value hash.

Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v))
    return repr(v)


def frame_key(df):
    """(n_rows, sorted col names, sorted row reprs with cols name-sorted)."""
    cols = sorted(df.columns)
    rows = sorted(
        tuple(norm_cell(r[c]) for c in cols) for r in df.to_dict("records")
    )
    return len(rows), cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )

    from pdf_extract_spark.runtime import release_caches

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[2:] or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK ERROR: {e}")
            failed.append(name)
            continue
        finally:
            # builder-persisted intermediates have caller-owned lifetime
            release_caches()
        t1 = time.time()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows "
                  f"({t1 - t0:.1f}s) [no oracle]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} DUCK ERROR: {e}")
            failed.append(name)
            continue
        sn, sc, sv = frame_key(sdf)
        dn, dc, dv = frame_key(ddf)
        ok = (sn, sc, sv) == (dn, dc, dv)
        status = "OK " if ok else "FAIL"
        print(f"{name:28s} {status} spark={sn} duck={dn} "
              f"({t1 - t0:.1f}s spark, {time.time() - t1:.1f}s duck)")
        if not ok:
            failed.append(name)
            if sc != dc:
                print(f"  cols spark={sc}\n  cols duck ={dc}")
            else:
                sonly = [r for r in sv if r not in set(map(tuple, dv))][:3]
                donly = [r for r in dv if r not in set(map(tuple, sv))][:3]
                print(f"  spark-only: {sonly}\n  duck-only : {donly}")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} OK; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
