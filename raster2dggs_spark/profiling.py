"""Opt-in phase timing for ``--profile`` — reference parity with
ref raster2dggs/profiling.py (phase wall + CPU, parallelism, stall %).

The reference instruments its ThreadPoolExecutor workers with
per-thread CPU clocks because cProfile can't see them
(ref profiling.py:1-21).  The Spark analogue of "worker thread time" is
TASK time: for each named phase this profiler snapshots the
AppStatusStore before and after and attributes the growth in per-stage
``executorRunTime`` / ``executorCpuTime`` / completed-task counts to
the phase.  From those it derives the same two figures the reference
reports (ref profiling.py:231-272):

- **parallelism** = task CPU seconds per second of phase wall — how
  many cores' worth of work the executors sustained;
- **stall %** = share of task time not on-CPU — shuffle fetch, disk,
  and (the reference's headline case) GIL/Arrow-transfer waits inside
  Python UDF workers.

Works in local mode and on a cluster; needs no Spark UI (the status
store backs the UI but exists regardless).  Cost when disabled: one
attribute check, like the reference's no-op context manager.
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class SparkPhaseProfiler:
    def __init__(self, spark, enabled: bool = True):
        self.spark = spark
        self.enabled = enabled
        self._phases: list[dict] = []
        self._t0 = time.perf_counter()

    # -- stage metric snapshots -----------------------------------------
    def _snapshot(self) -> dict[int, tuple[int, int, int]]:
        """stage_id → (executorRunTime ms, executorCpuTime ns, tasks)
        for every stage of every job in the default group so far."""
        out: dict[int, tuple[int, int, int]] = {}
        try:
            sc = self.spark.sparkContext
            tracker = sc.statusTracker()
            store = sc._jsc.sc().statusStore()
            for jid in tracker.getJobIdsForGroup(None):
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    if sid in out:
                        continue
                    try:
                        s = store.lastStageAttempt(sid)
                    except Exception:  # stage evicted / not yet submitted
                        continue
                    out[sid] = (int(s.executorRunTime()),
                                int(s.executorCpuTime()),
                                int(s.numCompleteTasks()))
        except Exception:
            # statusStore() reaches private JVM internals; on a Spark that
            # moves them, degrade to wall-clock-only phases rather than
            # crashing the whole --profile run (round-5 ADVICE)
            return {}
        return out

    @contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        before = self._snapshot()
        w0 = time.perf_counter()
        c0 = time.process_time()
        try:
            yield
        finally:
            wall = time.perf_counter() - w0
            drv_cpu = time.process_time() - c0
            after = self._snapshot()
            run_ms = cpu_ns = tasks = 0
            for sid, (r, c, t) in after.items():
                r0, c0_, t0_ = before.get(sid, (0, 0, 0))
                run_ms += max(r - r0, 0)
                cpu_ns += max(c - c0_, 0)
                tasks += max(t - t0_, 0)
            self._phases.append({
                "phase": name, "wall_s": wall, "driver_cpu_s": drv_cpu,
                "task_time_s": run_ms / 1e3, "task_cpu_s": cpu_ns / 1e9,
                "tasks": tasks,
            })

    # -- report ----------------------------------------------------------
    def report(self) -> str:
        """The reference's table shape (ref profiling.py:176-229):
        phase | wall | task-time | task-CPU | tasks | parallelism |
        stall %, plus the total-wall footer and the parallelism /
        stall summary lines."""
        total_wall = time.perf_counter() - self._t0
        lines = ["raster2dggs_spark --profile (Spark task metrics)",
                 f"  {'phase':<22}{'wall s':>9}{'task s':>9}"
                 f"{'cpu s':>9}{'tasks':>7}{'par':>6}{'stall':>7}"]
        tot_task = tot_cpu = 0.0
        for p in self._phases:
            par = p["task_cpu_s"] / p["wall_s"] if p["wall_s"] > 0 else 0.0
            stall = (1.0 - p["task_cpu_s"] / p["task_time_s"]
                     if p["task_time_s"] > 0 else 0.0)
            tot_task += p["task_time_s"]
            tot_cpu += p["task_cpu_s"]
            lines.append(
                f"  {p['phase']:<22}{p['wall_s']:>9.3f}"
                f"{p['task_time_s']:>9.3f}{p['task_cpu_s']:>9.3f}"
                f"{p['tasks']:>7d}{par:>6.2f}{100 * stall:>6.1f}%"
            )
        lines.append(f"  {'-' * 67}")
        lines.append(f"  {'wall clock':<22}{total_wall:>9.3f}")
        if total_wall > 0:
            lines.append(
                f"  executor parallelism: {tot_cpu / total_wall:.2f}x "
                f"({tot_cpu:.3f}s task CPU in {total_wall:.3f}s wall)"
            )
        if tot_task > 0:
            stalled = tot_task - tot_cpu
            lines.append(
                f"  task stall: {100 * stalled / tot_task:.1f}% "
                f"({stalled:.3f}s of {tot_task:.3f}s task-time blocked — "
                "shuffle/IO/Python-UDF transfer)"
            )
        return "\n".join(lines)
