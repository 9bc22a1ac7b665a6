"""Dump .explain("formatted") for registered queries to per-query text files.

Usage:  python3 tools/plandump.py OUT_DIR SUFFIX [sf_dir] [query ...]

Writes OUT_DIR/<query><SUFFIX>.txt for each named query (default: every
registered query).  Used to commit the before/after physical plans that back
the optimization-round claims (plans/r11/<query>_before.txt / _after.txt):
run it once from the pre-round commit (a git worktree) with SUFFIX=_before
and once from HEAD with SUFFIX=_after.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path(sys.argv[1])
SUFFIX = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[4:])


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def main() -> None:
    from flockdb_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name in sorted(qs):
        if ONLY and name not in ONLY:
            continue
        try:
            text = plan_str(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — keep the sweep going
            text = f"ERROR building {name}: {e}"
        (OUT_DIR / f"{name}{SUFFIX}.txt").write_text(text + "\n")
        print(f"wrote {name}{SUFFIX}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
