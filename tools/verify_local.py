"""Local stand-in for the driver's correctness gate: run every query at a
given SF through Spark AND its DuckDB oracle, compare row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values canonicalized).  Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.schemas import TESTDATA_TABLES  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok*   {name}: rows={len(srows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            ddf = con.sql(q.oracle)
            dcols = [d[0] for d in ddf.description]
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sh = table_hash(scols, [tuple(r) for r in srows])
        dh = table_hash(dcols, drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ok_hash = sh == dh
        status = "ok" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{status:5} {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}\n      duck  cols: {sorted(dcols)}")
            elif not ok_hash and srows and drows:
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(canon(r[i]) for i in so) for r in srows}
                dset = {tuple(canon(r[i]) for i in do) for r in drows}
                print(f"      spark-only: {list(sset - dset)[:3]}")
                print(f"      duck-only : {list(dset - sset)[:3]}")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
