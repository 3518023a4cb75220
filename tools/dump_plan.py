"""Dump ``explain("formatted")`` for named catalog queries to files.

Optimization-round evidence helper: writes one ``<outdir>/<name>_<tag>.txt``
per query (the judge checks plan claims against these).

Usage:
    python tools/dump_plan.py OUTDIR TAG q_name1 [q_name2 ...] [--sf SF_DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from databricks_feature_store_flight_school_spark.plans import catalog  # noqa: E402
from databricks_feature_store_flight_school_spark.session import get_spark  # noqa: E402
from tools.gen_plans import explain_formatted, summarize  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    outdir, tag, *names = args
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    qmap = catalog.query_map()
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = explain_formatted(df)
        path = out / f"{name}_{tag}.txt"
        path.write_text(f"# {name} @ {sf_dir}\n# {summarize(plan)}\n\n{plan}")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
