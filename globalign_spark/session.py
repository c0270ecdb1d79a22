"""SparkSession builder with engine defaults.

Tuned for the sandbox (single JVM, local[N]) but every setting is the one
we would ship to a 1000-executor cluster:
  - AQE on (runtime coalesce, skew-join backstop),
  - Arrow on (all Python<->JVM crossings are columnar batches),
  - shuffle partition count sized to cores (overridable per job).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "globalign_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        # Only default the master when this process OWNS the JVM. Under
        # spark-submit the gateway JVM already carries --master (local,
        # local-cluster, yarn, k8s); setting builder.master here would
        # silently override the submitted cluster with local[cpus].
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cpus)
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16k rows/batch: the pairwise scorer re-chunks each Arrow batch
        # into shape-homogeneous DP sub-batches, and chunk quality rises
        # with the pairs visible per batch (4k: 1.4x padding; 16k: 1.2x,
        # measured at sf0.1). 64k regresses (batch materialization latency
        # + memory pressure beat the marginal padding win).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Shuffle files are reclaimed only when the driver GC collects the
        # corresponding RDD objects; with a large driver heap that can be
        # never, so a long session running heavy query after heavy query
        # accumulates dead shuffle state on local disk until it fills (the
        # default periodicGC is 30min — measured: a 3-query gen-sf10 bench
        # session filled 80 GB of /tmp and died). 2min keeps dead shuffle
        # bounded at a negligible GC cost; same setting ships to clusters,
        # where the equivalent failure is executor-disk pressure.
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
