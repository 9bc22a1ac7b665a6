"""Per-query job/stage/task audit — the status-tracker method VERDICT r7/r8
used to separate job-floor cost from plan waste.  Runs each named query at
the given SF exactly like bench.py's timed pass (noop sink, CONSTRUCT_IN_PASS
rebuilt, index-persisted caches cleared) and prints one line per query:
wall seconds, Spark job count, stage count, task count.

Usage: python tools/jobaudit.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = args

    from bench import CONSTRUCT_IN_PASS, INDEX_PERSISTED, shuffle_partitions_for
    from flockdb_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="flockdb-jobaudit",
        shuffle_partitions=shuffle_partitions_for(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    from flockdb_spark.queries import params_for, store_for

    st = store_for(spark, sf_dir)
    st.edges.count()
    st.metadata.count()
    params_for(spark, sf_dir)
    st.edges.limit(10).write.format("noop").mode("overwrite").save()

    tracker = spark.sparkContext.statusTracker()
    jsc = spark.sparkContext._jsc.sc().statusTracker()

    for name in names:
        for attempt in range(3):
            if name in INDEX_PERSISTED:
                spark.catalog.clearCache()
            # attempt-boundary hygiene, same as bench.py's pass boundary:
            # force a full GC OUTSIDE the timed section so ContextCleaner's
            # weak-ref shuffle/broadcast cleanup from the previous attempt
            # cannot bleed into this attempt's wall (r11: an sf3.0 x91 probe
            # without this degraded 9s -> 28s -> 67s across attempts from
            # carried shuffle state, not the plan)
            spark._jvm.System.gc()
            # unique per-attempt group: attempts share nothing, so each
            # attempt's job/stage/task counts are exact, not cumulative
            # (earlier revisions read the default group for before_jobs,
            # which inflated attempts 1 and 2)
            group = f"{name}#{attempt}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            job_ids = list(tracker.getJobIdsForGroup(group) or [])
            n_stages = 0
            n_tasks = 0
            for j in job_ids:
                info = jsc.getJobInfo(j)
                if info.isEmpty():
                    continue
                for s in info.get().stageIds():
                    si = jsc.getStageInfo(s)
                    if not si.isEmpty():
                        n_stages += 1
                        n_tasks += si.get().numTasks()
            print(
                f"{name} attempt={attempt} wall={dt:.3f}s jobs={len(job_ids)} "
                f"stages={n_stages} tasks={n_tasks}",
                flush=True,
            )
            spark.sparkContext.setJobGroup("", "")
            for c in getattr(df, "_flockdb_caches", []):
                c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
