"""The driver's events.parquet ts encoding changed under us once (round 3:
TIMESTAMP(NANOS) -> micros TIMESTAMP_NTZ), crashing unix_micros call sites
(sessionize, as-of tolerance) and with them the whole bench.  This battery
pins the contract: ``tables.load`` must yield an identical session-TZ
TIMESTAMP column for every plausible parquet encoding, so the next
environment flip is a red test here — not a bench crash.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_ss_hudi_delta_poc_spark import tables
from spark_ss_hudi_delta_poc_spark.plans import all_queries
from spark_ss_hudi_delta_poc_spark.schemas import TESTDATA_TABLES

from conftest import SF_SMOKE

# batch ts-consumers, including the two round-3 crashers
TS_BATTERY = [
    "q05_ts_roundtrip",
    "q11_datetime_battery",
    "q17_asof_join",
    "q20_sessionize",
    "q35_moving_agg",
    "q55_asof_tolerance",
    "q57_funnel",
]


def _events_arrow() -> pa.Table:
    return pq.read_table(os.path.join(SF_SMOKE, "events.parquet"))


def _fixture_dir(tmp_path: Path, events: pa.Table, tag: str) -> str:
    """An sf-dir whose events.parquet uses the given encoding; every other
    table symlinks the canonical smoke data."""
    d = tmp_path / f"sf_{tag}"
    d.mkdir()
    for t in TESTDATA_TABLES:
        if t != "events":
            os.symlink(os.path.join(SF_SMOKE, f"{t}.parquet"), d / f"{t}.parquet")
    pq.write_table(events, d / "events.parquet")
    return str(d)


def _as_us(events: pa.Table, tz: str | None) -> pa.Table:
    i = events.schema.get_field_index("ts")
    col = events.column(i).cast(pa.timestamp("us", tz=tz))
    return events.set_column(i, pa.field("ts", pa.timestamp("us", tz=tz)), col)


def _as_ns(events: pa.Table) -> pa.Table:
    i = events.schema.get_field_index("ts")
    col = events.column(i).cast(pa.timestamp("ns"))
    return events.set_column(i, pa.field("ts", pa.timestamp("ns")), col)


ENCODINGS = {
    "ntz_us": lambda ev: _as_us(ev, None),  # current driver encoding
    "utc_us": lambda ev: _as_us(ev, "UTC"),  # tz-aware micros
    "nanos": _as_ns,  # round-1/2 driver encoding (nanosAsLong path)
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    ev = _events_arrow()
    tmp = tmp_path_factory.mktemp("ntz")
    return {tag: _fixture_dir(tmp, fn(ev), tag) for tag, fn in ENCODINGS.items()}


def test_load_normalizes_every_encoding_to_session_timestamp(spark, encoded_dirs):
    vals = {}
    for tag, d in encoded_dirs.items():
        df = tables.load(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", f"{tag}: {dict(df.dtypes)['ts']}"
        row = df.selectExpr(
            "count(*) AS n", "min(unix_micros(ts)) AS lo", "max(unix_micros(ts)) AS hi"
        ).collect()[0]
        vals[tag] = (row["n"], row["lo"], row["hi"])
    assert len(set(vals.values())) == 1, f"encodings disagree: {vals}"


@pytest.mark.parametrize("name", TS_BATTERY)
def test_ts_battery_identical_across_encodings(spark, encoded_dirs, name):
    q = all_queries()[name]
    results = {}
    for tag, d in encoded_dirs.items():
        pdf = q.fn(spark, d).toPandas()
        cols = sorted(pdf.columns)
        lines = sorted(
            "\x1f".join(str(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)
        )
        results[tag] = (len(pdf), tuple(cols), hash(tuple(lines)))
    assert len(set(results.values())) == 1, f"{name} diverges across encodings: " + str(
        {t: r[:2] for t, r in results.items()}
    )
