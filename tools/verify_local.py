"""Local stand-in for the driver's correctness gate: run every query at a
given SF through Spark AND its DuckDB oracle, compare row count, column
names, and an order-insensitive value hash (columns sorted by name, rows
sorted, values canonicalized).

CRITICAL (round-1 lesson): both sides are canonicalized through *pandas*
exactly like the driver — Spark via ``toPandas()``, DuckDB via ``.df()`` —
NOT via ``collect()``/``fetchall()``.  The driver's canonicalizer sees
pandas dtypes, so DuckDB ``SUM(BIGINT)`` (HUGEINT -> float64 ``40000.0``)
hash-mismatches Spark int64 ``40000`` even though the values are equal,
and list-typed columns throw ``unhashable type: 'list'`` inside
``sort_values``.  Round 1's ``fetchall()``-based gate converted HUGEINT to
Python int and silently passed 18 queries the driver failed.  Usage:

    python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.schemas import TESTDATA_TABLES  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402


def canon_val(v) -> str:
    """Dtype-sensitive stringification: int64 40000 != float64 40000.0,
    mirroring how the driver's pandas-based canonicalizer behaves."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # the driver throws before it gets here (sort_values), but be loud
        raise TypeError(f"driver-breaking container value in output: {type(v).__name__}")
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        # dtype-marked: a boolean True must NOT hash equal to the string
        # 'true' — the driver distinguishes them, and the lax lowercase
        # form masked q90's partition-column string drift at every SF
        # (CORRECTNESS_r06: driver red, this gate green)
        return "bool:true" if v else "bool:false"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime, date)):
        # driver equates DATE with midnight TIMESTAMP (q05/q61 passed r1
        # with Spark date objects vs DuckDB datetime64) — normalize both
        return pd.Timestamp(v).isoformat(sep=" ")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canon_lines(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # the driver sorts rows with sort_values(by=all columns) — keep this
    # call purely to reproduce its TypeError on list-typed columns
    pdf = pdf.sort_values(by=cols, kind="stable")
    return sorted(
        "\x1f".join(canon_val(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )


def table_hash(pdf: pd.DataFrame) -> str:
    return hashlib.md5("\n".join(canon_lines(pdf)).encode()).hexdigest()


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
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if q.oracle is None:
            print(f"ok*   {name}: rows={len(spdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            if len(spdf) == 0:
                print("      WARNING: zero rows")
            continue
        try:
            dpdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        try:
            slines = canon_lines(spdf)
        except TypeError as e:
            print(f"FAIL  {name}: spark output not driver-canonicalizable: {e}")
            failures.append(name)
            continue
        try:
            dlines = canon_lines(dpdf)
        except TypeError as e:
            print(f"FAIL  {name}: oracle output not driver-canonicalizable: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(spdf.columns) == sorted(dpdf.columns)
        ok_rows = len(spdf) == len(dpdf)
        ok_hash = slines == dlines
        status = "ok" if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"{status:5} {name}: rows {len(spdf)}/{len(dpdf)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(spdf.columns)}\n      duck  cols: {sorted(dpdf.columns)}")
            elif not ok_hash:
                sset, dset = set(slines), set(dlines)
                print(f"      spark dtypes: {dict(spdf.dtypes.astype(str))}")
                print(f"      duck  dtypes: {dict(dpdf.dtypes.astype(str))}")
                print(f"      spark-only: {sorted(sset - dset)[:3]}")
                print(f"      duck-only : {sorted(dset - sset)[:3]}")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
