"""Same-machine bench A/B replay — the attribution step SCALE.md requires
before treating any bench delta as a plan regression.

Single-run headlines on this box spread ±10% with machine load (round 6:
identical code read 40.4-49 s across a day), so a round-over-round delta
means nothing until the PRIOR code is replayed on the SAME box back to
back with HEAD.  This tool codifies that recipe:

    python tools/bench_ab.py [base_ref] [runs]

- ``base_ref`` defaults to the newest driver round commit (message
  ``round N: ...``) — the code the previous BENCH_r{N}.json measured;
- checks out ``base_ref`` into a git worktree under /tmp (reused across
  invocations), runs ``bench.py`` there, then at HEAD, alternating
  ``runs`` times (default 1 each, back to back);
- writes ``bench_ab.json`` at the repo root: per-query ratios over the
  SHARED query set plus the shared-total ratio.  Ratio ~1.0±0.05 on
  untouched queries = machine parity; a query far off that with the same
  plan is a real regression.

Interpretation contract: compare ratios, never absolute seconds across
rounds; only BENCH files from the same bench_ab-validated session are
comparable in absolute terms.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(
        args, cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def default_base_ref() -> str:
    out = sh("git", "log", "--grep", "^round [0-9]*:", "-E", "--format=%H", "-n", "1")
    if not out:
        raise SystemExit("no 'round N:' commit found; pass base_ref explicitly")
    return out


def run_bench(workdir: str) -> dict:
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "bench.py"], cwd=workdir, env=env, capture_output=True, text=True
    )
    if r.returncode != 0:
        raise SystemExit(f"bench failed in {workdir}:\n{r.stderr[-2000:]}")
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    if not out.get("valid", True):
        raise SystemExit(f"bench in {workdir} returned valid=false — fix before A/B")
    return out


def main() -> int:
    base_ref = sys.argv[1] if len(sys.argv) > 1 else default_base_ref()
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    base_sha = sh("git", "rev-parse", base_ref)
    head_sha = sh("git", "rev-parse", "HEAD")
    wt = f"/tmp/spark_graft_ab/{base_sha[:12]}"
    if not os.path.isdir(wt):
        os.makedirs(os.path.dirname(wt), exist_ok=True)
        sh("git", "worktree", "add", "--detach", wt, base_sha)
    base_runs, head_runs = [], []
    for i in range(runs):
        # alternate so slow machine phases hit both sides equally
        base_runs.append(run_bench(wt))
        head_runs.append(run_bench(REPO))
        print(
            f"run {i + 1}/{runs}: base {base_runs[-1]['value']} s, "
            f"head {head_runs[-1]['value']} s",
            flush=True,
        )
    # median across runs (VERDICT r12 #3: with runs>=2 alternating, a
    # single loaded window can't dominate either side; median of 2 =
    # mean, and odd run counts discard the outlier entirely)
    med = statistics.median
    bq = {k: med([r["queries"][k] for r in base_runs]) for k in base_runs[0]["queries"]}
    hq = {k: med([r["queries"][k] for r in head_runs]) for k in head_runs[0]["queries"]}
    # fixed-work calibration rows (present since round 13): their ratio
    # is pure box drift between the two alternating streams — divide it
    # out of the shared ratio to get the plan-attributable residual
    b_cal = [r["calibration_sec"] for r in base_runs if r.get("calibration_sec")]
    h_cal = [r["calibration_sec"] for r in head_runs if r.get("calibration_sec")]
    cal_ratio = (
        round(med(h_cal) / med(b_cal), 3) if b_cal and h_cal else None
    )
    # the I/O-side instrument (VERDICT r14 #5): present on both sides
    # only once the base ref also carries io_calibration_sec (r15+)
    b_io = [r["io_calibration_sec"] for r in base_runs if r.get("io_calibration_sec")]
    h_io = [r["io_calibration_sec"] for r in head_runs if r.get("io_calibration_sec")]
    io_ratio = round(med(h_io) / med(b_io), 3) if b_io and h_io else None
    shared = sorted(set(bq) & set(hq))
    base_shared = sum(bq[k] for k in shared)
    head_shared = sum(hq[k] for k in shared)
    per_query = {
        k: {
            "base_s": round(bq[k], 3),
            "head_s": round(hq[k], 3),
            "ratio": round(hq[k] / bq[k], 2) if bq[k] > 0 else None,
        }
        for k in shared
    }
    out = {
        "base_ref": base_sha,
        "head": head_sha,
        "runs_each": runs,
        # totals from the SAME median-per-query aggregation as per_query /
        # shared_ratio (ADVICE r7: last-run totals vs per-query ratios
        # could disagree when runs > 1); last raw run kept for reference
        "base_total_s": round(sum(bq.values()), 2),
        "head_total_s": round(sum(hq.values()), 2),
        "base_last_run_s": round(base_runs[-1]["value"], 2),
        "head_last_run_s": round(head_runs[-1]["value"], 2),
        "shared_queries": len(shared),
        "base_shared_s": round(base_shared, 2),
        "head_shared_s": round(head_shared, 2),
        "shared_ratio": round(head_shared / base_shared, 3) if base_shared else None,
        # box-drift separation (None until both sides' bench.py carries
        # the calibration row — first cross-round A/B with it: r13→r14)
        # the two instruments BRACKET box drift: cpu_ for CPU-bound
        # rows, io_ for file-listing/parquet-decode-bound rows.  When
        # the raw and either normalized ratio straddle 1.0, attribute
        # per-query with plans, citing the instrument that matches the
        # row's cost class (SCALE.md's r14 straddle rule, instrumented)
        "calibration_ratio": cal_ratio,
        "io_calibration_ratio": io_ratio,
        "drift_normalized_shared_ratio": (
            round(head_shared / base_shared / cal_ratio, 3)
            if base_shared and cal_ratio
            else None
        ),
        "io_normalized_shared_ratio": (
            round(head_shared / base_shared / io_ratio, 3)
            if base_shared and io_ratio
            else None
        ),
        "only_in_head": sorted(set(hq) - set(bq)),
        "only_in_base": sorted(set(bq) - set(hq)),
        "per_query": per_query,
    }
    with open(os.path.join(REPO, "bench_ab.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    worst = sorted(
        (k for k in shared if bq[k] > 0.2), key=lambda k: -per_query[k]["ratio"] if per_query[k]["ratio"] else 0
    )[:5]
    print(json.dumps({"shared_ratio": out["shared_ratio"],
                      "worst": {k: per_query[k] for k in worst}}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
