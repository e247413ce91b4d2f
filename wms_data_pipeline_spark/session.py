"""SparkSession factory.

The reference UTC-normalizes timestamps at four separate layers
(reference: services/common/... normalize.py:6-9, watermark_repo.py:6-9,
mock_wms_api main.py:16-27). Here one session-level setting replaces all of
that: ``spark.sql.session.timeZone=UTC`` plus a tz-aware parse contract.

Scale notes (100 TB design target):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  dynamic join-strategy switches are the first line of defense at scale.
- ``shuffle.partitions`` defaults to a small local value but is an explicit
  knob — on a 1000-executor cluster set it ~2-3x total cores (or rely on AQE
  coalescing from a high initial value).
- Arrow enabled: every Pandas-UDF escape hatch (similarity, multimodal)
  transfers columnar batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 10 MB default is conservative; dims like region/nation/customer at any
    # SF we broadcast explicitly, this just lets Catalyst catch the rest.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Parquet scans: allow splitting large files into ~128 MB tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "wms-data-pipeline-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured — on a real cluster, leave it unset
    and submit via spark-submit.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
