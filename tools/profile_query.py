"""Profile one headline query: run it (warm) and dump every Spark job's
duration + description from the local UI REST API, so the seconds in
bench.py can be attributed to phases (guide §1: measure first).

    python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from spark_ss_hudi_delta_poc_spark.plans import all_queries  # noqa: E402
from spark_ss_hudi_delta_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]
    q.fn(spark, sf_dir).count()  # warmup (cold path excluded, bench discipline)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    before = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
    first_new = max((j["jobId"] for j in before), default=-1) + 1
    t0 = time.time()
    n = q.fn(spark, sf_dir).count()
    wall = time.time() - t0
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs?status=succeeded"))
    new = sorted((j for j in jobs if j["jobId"] >= first_new), key=lambda j: j["jobId"])
    total_job = 0.0
    print(f"== {name}: wall {wall:.2f}s, {n} rows, {len(new)} jobs ==")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    def ms(j):
        return ts(j["completionTime"]) - ts(j["submissionTime"])

    rows = []
    for j in new:
        d = ms(j)
        total_job += d
        desc = (j.get("description") or j.get("name") or "")[:110]
        rows.append((d, j["jobId"], j["numTasks"], desc))
    for d, jid, nt, desc in rows:
        print(f"  job {jid:4d} {d:7.3f}s  tasks={nt:4d}  {desc}")
    print(f"== sum(job durations) {total_job:.2f}s vs wall {wall:.2f}s (gap = driver-side) ==")
    print("== top jobs ==")
    by_id = {j["jobId"]: j for j in new}
    for d, jid, nt, desc in sorted(rows, reverse=True)[:12]:
        print(f"  job {jid:4d} {d:7.3f}s  tasks={nt:4d}  {desc}")
        for sid in sorted(by_id[jid].get("stageIds", [])):
            try:
                st = json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app}/stages/{sid}"
                    )
                )
            except Exception:
                continue
            for s in st:
                if s["status"] not in ("COMPLETE", "SKIPPED"):
                    continue
                nm = s["name"].split("\n")[0][:90]
                print(
                    f"    stage {sid:4d} [{s['status'][:4]}] run={s['executorRunTime']/1e3:6.2f}s "
                    f"cpu={s['executorCpuTime']/1e9:6.2f}s tasks={s['numCompleteTasks']:3d} {nm}"
                )


if __name__ == "__main__":
    main()
