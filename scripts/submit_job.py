"""Cluster deployment entry point (BASELINE.json north_rule: "runs via
spark-submit --py-files on a multi-executor cluster").

Usage (the test in tests/test_determinism.py drives exactly this, with
the package zipped and the repo absent from every import path):

    spark-submit --master <master> --py-files ccrawler_spark.zip \
        scripts/submit_job.py --size tiny --rounds 2 \
        --fixture-dir /path/to/fixtures --out /path/to/store

The script is a thin shim: all logic lives in the package so the zip is
the single deployment artifact. ``ccrawler_spark.scheduler.cli`` resolves
from the --py-files zip (driver and executors alike); its build_session
exports the zip path on PYTHONPATH for the Python UDF workers.
"""

import sys

from ccrawler_spark.scheduler.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
