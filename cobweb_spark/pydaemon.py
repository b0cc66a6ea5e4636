"""Python-worker daemon with the scientific stack preloaded.

``pyspark.daemon`` forks one worker per task slot; a fresh worker lazily
imports numpy/pandas/pyarrow on its first Arrow batch — ~1.5-2s of
interpreter work on the task's critical path. Workers are not always
reused: when the JVM stops reading a worker's output early (limits,
hash-join short circuits, AQE-pruned partitions) the worker is released
uncleanly and destroyed, and the next task pays the import storm again —
measured as a multi-second fixed cost per Python task at 16 concurrent
slots (BENCH/BASELINE.md round-4 scaling postmortem).

Importing the stack in the daemon BEFORE the first fork makes every
child inherit the initialized modules through copy-on-write, so a worker
respawn costs just the fork. Wired up via the standard public knob
``spark.python.daemon.module`` (see ``cobweb_spark.session.get_spark``);
the module must be importable by the executor-side Python — in the
sandbox via ``spark.executorEnv.PYTHONPATH``, on a real cluster via the
``--py-files`` zip already on the worker path.

Fork-safety: forking a process that already started threads can deadlock
or crash the children, and allocator/BLAS threads are the usual
culprits. Mitigations here: (1) thread-pool env caps are set to 1 BEFORE
importing numpy, so its BLAS backend never spins up a pool in the daemon
(workers run one-per-core anyway — a per-worker BLAS pool would
oversubscribe); (2) ONLY numpy is preloaded. pandas is deliberately NOT:
its import transitively loads libarrow, whose bundled jemalloc starts a
``jemalloc_bg_thd`` background thread that survives into the daemon —
forking past a live allocator thread produced sporadic mid-task worker
crashes ("Python worker exited unexpectedly" during Arrow reads, with
task-retry storms multiplying stage times ~2x; verified by thread
enumeration after each import and by crash-free runs under the stock
daemon). Neither MALLOC_CONF=background_thread:false nor
ARROW_DEFAULT_MEMORY_POOL=system suppresses it — Arrow's bundled
jemalloc hardwires its own conf. With numpy warm through the fork,
the worker-side residual is pandas+pyarrow at ~0.3s (measured) vs the
~2s full storm. If a deployment still trips a fork issue, set
``SPARK_GRAFT_PY_DAEMON=pyspark.daemon`` before building the session to
fall back to the stock daemon (see ``session.get_spark``).
"""

import os

# Cap BLAS/OpenMP pools before numpy import: no pre-fork thread creation.
for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ.setdefault(_v, "1")

import numpy  # noqa: F401,E402  (preload: inherited by forked workers)
# NO pandas/pyarrow here: libarrow's jemalloc background thread is a
# fork hazard (see module docstring).

from pyspark.daemon import manager  # noqa: E402


def _install_forklog(path: str) -> None:
    """Respawn-churn diagnostics (opt-in via SPARK_GRAFT_FORKLOG=<path>):
    append one line per worker fork — timestamp + child pid — so a bench
    run can count respawns and correlate them with stage boundaries.
    Wraps os.fork for this process only; a single O_APPEND write in the
    child, no locks."""
    import time

    real_fork = os.fork

    def logged_fork():
        pid = real_fork()
        if pid == 0:
            try:
                fd = os.open(
                    path, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644
                )
                os.write(
                    fd, f"{time.time():.3f} {os.getpid()}\n".encode()
                )
                os.close(fd)
            except OSError:
                pass
        return pid

    os.fork = logged_fork


if __name__ == "__main__":
    _forklog = os.environ.get("SPARK_GRAFT_FORKLOG")
    if _forklog:
        _install_forklog(_forklog)
    manager()
