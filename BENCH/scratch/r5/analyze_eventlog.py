"""Per-wave / per-stage metric rollup from a Spark event log."""
import json
import sys
from collections import defaultdict


def load(path):
    stage_to_wave = {}
    stage_agg = defaultdict(lambda: defaultdict(float))
    stage_tasks = defaultdict(int)
    stage_window = {}
    stage_name = {}
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
            for si in ev.get("Stage Infos", []):
                stage_to_wave[si["Stage ID"]] = grp
                stage_name[si["Stage ID"]] = si.get("Stage Name", "")
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            tm = ev.get("Task Metrics") or {}
            ti = ev.get("Task Info") or {}
            a = stage_agg[sid]
            stage_tasks[sid] += 1
            a["run_ms"] += tm.get("Executor Run Time", 0)
            a["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
            a["gc_ms"] += tm.get("JVM GC Time", 0)
            a["spill_mem"] += tm.get("Memory Bytes Spilled", 0)
            a["spill_disk"] += tm.get("Disk Bytes Spilled", 0)
            a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            a["sched_delay"] += max(
                0,
                ti.get("Launch Time", 0) and 0,
            )
            srm = tm.get("Shuffle Read Metrics") or {}
            a["sh_read"] += srm.get("Remote Bytes Read", 0) + srm.get(
                "Local Bytes Read", 0
            )
            a["sh_fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            a["sh_write"] += swm.get("Shuffle Bytes Written", 0)
            a["sh_write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
            lo, hi = stage_window.get(sid, (1 << 62, 0))
            stage_window[sid] = (
                min(lo, ti.get("Launch Time", lo)),
                max(hi, ti.get("Finish Time", hi)),
            )
    return stage_to_wave, stage_agg, stage_tasks, stage_window, stage_name


def main(path, min_wall=1.0):
    stage_to_wave, agg, tasks, window, names = load(path)
    rows = []
    for sid, a in agg.items():
        lo, hi = window.get(sid, (0, 0))
        wall = (hi - lo) / 1000.0
        rows.append((stage_to_wave.get(sid, "?"), sid, wall, a))
    rows.sort(key=lambda r: r[1])
    wave_tot = defaultdict(lambda: defaultdict(float))
    for wv, sid, wall, a in rows:
        if wall >= min_wall:
            print(
                f"{wv:>8} s{sid:<4} wall={wall:6.1f}s tasks={tasks[sid]:<4} "
                f"run={a['run_ms']/1000:7.1f}s cpu={a['cpu_ms']/1000:7.1f}s "
                f"gc={a['gc_ms']/1000:6.1f}s "
                f"spillM={a['spill_mem']/2**20:7.0f}M "
                f"spillD={a['spill_disk']/2**20:7.0f}M "
                f"shR={a['sh_read']/2**20:6.0f}M shW={a['sh_write']/2**20:6.0f}M "
                f"fwait={a['sh_fetch_wait_ms']/1000:5.1f}s "
                f"| {names.get(sid,'')[:40]}"
            )
        wt = wave_tot[stage_to_wave.get(sid, "?")]
        for k, v in a.items():
            wt[k] += v
        wt["wall"] += wall
    print("\n== per-wave totals ==")
    for wv in sorted(wave_tot, key=str):
        a = wave_tot[wv]
        print(
            f"{wv:>8} run={a['run_ms']/1000:8.1f}s cpu={a['cpu_ms']/1000:8.1f}s "
            f"gc={a['gc_ms']/1000:6.1f}s spillD={a['spill_disk']/2**20:8.0f}M "
            f"shR={a['sh_read']/2**20:7.0f}M fwait={a['sh_fetch_wait_ms']/1000:6.1f}s"
        )


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 1.0)
