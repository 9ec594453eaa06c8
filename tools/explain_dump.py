"""Dump `.explain("formatted")` for every headline bench query into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default r16) — the
optimization round's plan evidence.

Batch queries are explained directly; streaming queries are explained via
their committed batch SHADOW (streaming/shadows.py), the same graphs the
plan gates audit.  Shadows that return a dict of stages dump each stage.

    python tools/explain_dump.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402
from spark_ss_hudi_delta_poc_spark.streaming.shadows import (  # noqa: E402
    STREAM_SHADOWS,
)
from bench import HEADLINE  # noqa: E402


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        q = qs[name]
        try:
            if "streaming" in q.tags:
                shadow = STREAM_SHADOWS[name](spark, sf_dir)
                if isinstance(shadow, dict):
                    text = "".join(
                        f"=== shadow stage: {k} ===\n{_explain(v)}\n"
                        for k, v in shadow.items()
                    )
                else:
                    text = f"=== shadow ===\n{_explain(shadow)}\n"
                header = (
                    f"# {name} (streaming; plan via batch shadow at {sf_dir})\n"
                )
            else:
                text = _explain(q.fn(spark, sf_dir))
                header = f"# {name} (batch plan at {sf_dir})\n"
        except Exception as e:  # noqa: BLE001
            text = f"ERROR {type(e).__name__}: {e}\n"
            header = f"# {name}\n"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(header + text)
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
