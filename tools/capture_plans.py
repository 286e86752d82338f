#!/usr/bin/env python
"""Capture .explain('formatted') for headline bench queries into
plans/$PLANS_ROUND/ (default r14).

Usage:
    python tools/capture_plans.py before [key ...]
    python tools/capture_plans.py after  [key ...]

With no keys, captures every headline key. Output files:
    plans/$PLANS_ROUND/<key>_<tag>.txt

Plans are captured with the same session shape as bench.py (local[$CPUS],
shuffle partitions = $CPUS) so the judge can line plan claims up with the
bench numbers. Capturing a plan never executes the query (explain is
plan-time only), with the one caveat that queries whose PYTHON code runs
driver-side actions while BUILDING the frame (iterative operators: bpe
rounds, kmeans init, two-phase rank offsets) do execute those actions.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import bench
    from quantms_utils_spark.session import get_spark
    from quantms_utils_spark.queries import REGISTRY
    from quantms_utils_spark.plans.inspect import explain_str

    spark = get_spark(
        app_name="plan-capture",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = Path(REPO_ROOT) / "plans" / os.environ.get("PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)

    for key, name in bench.HEADLINE:
        if only and key not in only:
            continue
        try:
            df = REGISTRY[name][0](spark, SF_DIR)
            text = explain_str(df, "formatted")
        except Exception as exc:  # capture the failure instead of dying
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        (out_dir / f"{key}_{tag}.txt").write_text(text)
        print(f"{key}: {len(text)} chars", flush=True)
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
