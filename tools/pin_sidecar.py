"""Split-pin sidecar: driver JVM on a dedicated core set, executor JVMs
and their python workers on the slot set.

Why: pinning the whole subprocess tree to one mask (executor cores + a
driver allowance) lets the SMALL config's executors borrow the driver's
idle cores — 4 slots get 6 cores (1.5/slot) while 16 slots get 18
(1.125/slot), so N→4N efficiency is UNDER-measured by the hardware
asymmetry alone. A real cluster runs the driver on its own node; this
sidecar reproduces that: it sweeps /proc, pins executor-side processes
(CoarseGrainedExecutorBackend JVMs, pyspark daemons — python workers
fork from pinned daemons and inherit the mask) to the slot cores, and
everything else in the measurement tree (driver python + JVM, master,
worker launchers) to the driver cores, identical in both configs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def descendants(root: int) -> set[int]:
    children: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(pid))
    out: set[int] = set()
    stack = [root]
    while stack:
        p = stack.pop()
        for c in children.get(p, []):
            if c not in out:
                out.add(c)
                stack.append(c)
    return out


# Executor-side process detection. NOTE: conf values appear verbatim on
# the DRIVER JVM's command line (e.g. spark.python.daemon.module=
# cobweb_spark.pydaemon), so bare substrings like "pydaemon" would
# misclassify the driver — match the executor backend class and the
# `python -m <daemon module>` launch form specifically.
import re

EXEC_RE = re.compile(
    r"CoarseGrainedExecutorBackend"
    r"|-m (?:pyspark\.daemon|cobweb_spark\.pydaemon)\b"
)


def main(root_pid: int, exec_cpus: str, driver_cpus: str, interval: float):
    pinned: dict[int, str] = {}
    while True:
        if not os.path.isdir(f"/proc/{root_pid}"):
            return
        for pid in descendants(root_pid) | {root_pid}:
            cl = cmdline(pid)
            if not cl:
                continue
            mask = exec_cpus if EXEC_RE.search(cl) else driver_cpus
            if pinned.get(pid) == mask:
                continue
            r = subprocess.run(
                ["taskset", "-a", "-p", "-c", mask, str(pid)],
                capture_output=True,
            )
            if r.returncode == 0:
                pinned[pid] = mask
        time.sleep(interval)


if __name__ == "__main__":
    main(
        int(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        float(sys.argv[4]) if len(sys.argv) > 4 else 0.25,
    )
