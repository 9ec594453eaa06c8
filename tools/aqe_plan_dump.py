"""Dump the EXECUTED (AQE-final) plans of one headline query — every SQL
execution the run produced, from the UI REST API's planDescription field.

Static ``explain("formatted")`` shows the initial plan
(``AdaptiveSparkPlan isFinalPlan=false``) and never the runtime
``AQEShuffleRead`` nodes; the SQL tab's executed plan does (guide §7.2).
This is the committed evidence VERDICT r15 #5 asked for: a final plan that
actually shows whether AQE coalesced a given exchange, including the
foreachBatch-interior writes of the streaming ingests (each is its own SQL
execution).

    python tools/aqe_plan_dump.py <query> [sf_dir] [out_file]

Writes every execution as ``== execution <id>: <description> ==`` followed
by its planDescription.  Grep the output for ``AQEShuffleRead`` /
``coalesced`` to check coalescing claims against a real run.
"""

from __future__ import annotations

import json
import sys
import urllib.parse
import urllib.request

sys.path.insert(0, ".")

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_file = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark(app_name=f"aqe-dump-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]
    q.fn(spark, sf_dir).count()  # one warm run; all its executions are dumped
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    execs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/sql?"
            + urllib.parse.urlencode(
                {"details": "true", "planDescription": "true", "length": "1000"}
            )
        )
    )
    lines: list[str] = [f"# AQE-final executed plans of one {name} run (sf_dir={sf_dir})"]
    n_aqe = 0
    for e in sorted(execs, key=lambda x: x["id"]):
        plan = e.get("planDescription") or ""
        desc = (e.get("description") or "").split("\n")[0][:120]
        lines.append("")
        lines.append(f"== execution {e['id']}: {desc} ==")
        lines.append(plan)
        n_aqe += plan.count("AQEShuffleRead")
    lines.append("")
    lines.append(f"# total AQEShuffleRead nodes across the run: {n_aqe}")
    text = "\n".join(lines) + "\n"
    if out_file:
        with open(out_file, "w") as fh:
            fh.write(text)
        print(f"wrote {out_file} ({len(execs)} executions, {n_aqe} AQEShuffleRead nodes)")
    else:
        print(text)


if __name__ == "__main__":
    main()
