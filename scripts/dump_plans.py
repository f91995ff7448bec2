"""Dump .explain("formatted") for every declared query to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix is "before" or
"after" (second CLI arg style: tag like "r07/before").  Plan capture
only — no query is executed (AQE initial plans).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07/before"
    only = set(sys.argv[2:])
    suffix = os.path.basename(tag)
    out_dir = os.path.join(REPO, "plans", os.path.dirname(tag) or tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as em
    from localmod_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="plan_dump",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    q = em.queries()
    for name, fn in q.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
