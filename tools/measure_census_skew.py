"""Measure per-task skew of the census shuffle-fallback path (r15 verdict
item #1): run the census pair at a given SF with the closure broadcast gate
forced OFF (so `_edge_intersections` runs its shuffled joins — the 100 TB
dispatch), record the Spark event log, and print per-stage task-time and
shuffle-read distributions (n, median, p95, max, max/median) so a hub-key
straggler shows up as max >> median on the intersection-join stages.

Run: python tools/measure_census_skew.py [sf_dir] [out_json]
Defaults: .scratch/sf1  /tmp/census_skew.json
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wms_data_pipeline_spark.session import get_spark  # noqa: E402
from wms_data_pipeline_spark.operators import graph as gr  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _event_lines(path):
    """Yield event-json lines from a Spark event log: either a single file
    or a Spark 4 rolling directory (eventlog_v2_<appId>/events_*)."""
    import io

    def _open(p):
        if p.endswith(".zstd"):
            import pyarrow as pa

            return io.TextIOWrapper(
                pa.CompressedInputStream(pa.OSFile(p, "rb"), "zstd")
            )
        return open(p)

    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path) if n.startswith("events"))
        for n in names:
            with _open(os.path.join(path, n)) as f:
                yield from f
    else:
        with _open(path) as f:
            yield from f


def parse_event_log(path):
    stages = {}  # sid -> dict
    tasks = {}  # sid -> list of (dur_ms, shuffle_read_b, shuffle_write_b)
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "n_tasks": si["Number of Tasks"],
                }
            elif k == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                tm = ev.get("Task Metrics") or {}
                dur = (ti.get("Finish Time", 0) or 0) - (
                    ti.get("Launch Time", 0) or 0
                )
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                rb = (srm.get("Remote Bytes Read", 0) or 0) + (
                    srm.get("Local Bytes Read", 0) or 0
                )
                wb = swm.get("Shuffle Bytes Written", 0) or 0
                tasks.setdefault(sid, []).append((dur, rb, wb))
    out = []
    for sid in sorted(stages):
        ts = tasks.get(sid, [])
        if not ts:
            continue
        durs = sorted(t[0] for t in ts)
        rbs = sorted(t[1] for t in ts)
        med = statistics.median(durs)
        p95 = durs[min(len(durs) - 1, int(0.95 * len(durs)))]
        out.append(
            {
                "stage": sid,
                "name": stages[sid]["name"].split("\n")[0][:90],
                "n": len(durs),
                "sum_s": round(sum(durs) / 1000, 2),
                "med_ms": med,
                "p95_ms": p95,
                "max_ms": durs[-1],
                "skew": round(durs[-1] / med, 2) if med else None,
                "shuf_read_med_mb": round(
                    statistics.median(rbs) / 1e6, 1
                ),
                "shuf_read_max_mb": round(rbs[-1] / 1e6, 1),
            }
        )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/census_skew.json"
    evdir = "/tmp/r15_eventlog"
    os.makedirs(evdir, exist_ok=True)
    for f in os.listdir(evdir):
        os.unlink(os.path.join(evdir, f))
    spark = get_spark(
        app_name="census-skew",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    # force the shuffle-fallback dispatch of _edge_intersections (the
    # 100 TB path) regardless of the graph's edge count
    gr.BROADCAST_CLOSURE_MAX_EDGES = 0
    from wms_data_pipeline_spark.plans.queries import _copurchase_edges

    edges = _copurchase_edges(spark, sf_dir)
    walls = {}
    sc = spark.sparkContext
    for name, fn in (
        ("triangles", lambda: gr.triangle_stats(edges, assume_canonical=True)),
        ("clustering", lambda: gr.node_clustering(edges, assume_canonical=True)),
    ):
        sc.setJobDescription(f"census {name} {sf_dir} shuffle-fallback")
        t0 = time.perf_counter()
        noop(fn())
        walls[name] = round(time.perf_counter() - t0, 2)
        sc.setJobDescription(None)
    app_id = sc.applicationId
    spark.stop()
    log = os.path.join(evdir, app_id)
    if not os.path.exists(log):
        log = os.path.join(evdir, f"eventlog_v2_{app_id}")
    stats = parse_event_log(log)
    result = {"sf_dir": sf_dir, "walls": walls, "stages": stats}
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print("walls", walls)
    hdr = f"{'stage':>5} {'n':>4} {'sum_s':>7} {'med_ms':>7} {'p95':>7} {'max':>8} {'skew':>6} {'srd_med':>8} {'srd_max':>8}  name"
    print(hdr)
    for s in stats:
        if s["sum_s"] < 0.5:
            continue
        print(
            f"{s['stage']:>5} {s['n']:>4} {s['sum_s']:>7} {s['med_ms']:>7} "
            f"{s['p95_ms']:>7} {s['max_ms']:>8} {s['skew']:>6} "
            f"{s['shuf_read_med_mb']:>8} {s['shuf_read_max_mb']:>8}  {s['name']}"
        )


if __name__ == "__main__":
    main()
