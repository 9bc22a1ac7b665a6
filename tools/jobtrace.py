"""Per-JOB timeline for one bench query — jobaudit's drill-down twin.

Runs the named query exactly like bench.py's timed pass (noop sink,
CONSTRUCT_IN_PASS rebuilt, index caches cleared) and prints one line per
Spark job from the AppStatusStore: job id, wall, task count, and the
callsite/description — so a multi-job query's wall can be attributed to
specific collects/broadcasts/actions instead of guessed at.

Usage: python tools/jobtrace.py [sf_dir] query [query ...]
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

    from bench import INDEX_PERSISTED, shuffle_partitions_for
    from flockdb_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="flockdb-jobtrace",
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
    store = spark.sparkContext._jsc.sc().statusStore()

    for name in names:
        for attempt in range(3):
            if name in INDEX_PERSISTED:
                spark.catalog.clearCache()
            spark._jvm.System.gc()
            group = f"{name}#{attempt}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            c0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            c1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            job_ids = sorted(tracker.getJobIdsForGroup(group) or [])
            print(
                f"=== {name} attempt={attempt} wall={dt:.3f}s "
                f"(construct={c1 - c0:.3f}s) jobs={len(job_ids)}",
                flush=True,
            )
            for j in job_ids:
                try:
                    jd = store.job(j)
                except Exception:
                    continue
                sub = jd.submissionTime()
                comp = jd.completionTime()
                if sub.isDefined() and comp.isDefined():
                    ms = (
                        comp.get().getTime() - sub.get().getTime()
                    )
                else:
                    ms = -1
                dtxt = " ".join(str(jd.name()).split())[:110]
                print(
                    f"  job {j:>4} {ms / 1000.0:7.3f}s tasks={jd.numTasks():>4} {dtxt}",
                    flush=True,
                )
            spark.sparkContext.setJobGroup("", "")
            for c in getattr(df, "_flockdb_caches", []):
                c.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
