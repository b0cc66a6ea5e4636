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
"""

import numpy  # noqa: F401  (preload: inherited by forked workers)
import pandas  # noqa: F401
import pyarrow  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
