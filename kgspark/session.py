"""SparkSession factory with the settings the pipeline is designed around.

Local mode stands in for a multi-executor cluster; everything scale-relevant
(AQE, skew-join handling, shuffle partition count, Arrow batching) is
configured here so the same code runs unchanged under ``spark-submit
--py-files`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_local_dir() -> str:
    """tmpfs shuffle dirs when /dev/shm is actually big enough (the sandbox
    has 126G — the honest local stand-in for cluster NVMe+network shuffle);
    plain system tmp otherwise (default Docker mounts /dev/shm at 64MB,
    where a spilled shuffle would ENOSPC every wide stage)."""
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= 16 * 1024 ** 3:
            return "/dev/shm/kgspark-tmp"
    except OSError:
        pass
    return "/tmp"


def get_spark(app: str = "kgspark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # hub entities are deliberately Zipf-skewed; AQE splits oversized
        # join partitions at runtime (complements the explicit salting in
        # kgspark/linking.py)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = driver-only JVM: give it real memory (the sandbox box
        # has 128G; a small heap makes 32 concurrent tasks GC-bound and
        # wrecks scaling long before data volume does)
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "48g"))
        # GC: G1 (JVM default; A/B'd vs ParallelGC — G1 wins on this DAG)
        # with an explicitly enlarged young generation. The provenance
        # aggregation (collect_set states over millions of classes) is
        # allocation-rate-bound: event-log attribution at 1.6M pages showed
        # 19-44% of that stage's CPU in GC with default ergonomics, and
        # interleaved full-DAG A/B at local[32] measured means 122s -> 95s
        # (bests 100s -> 68s) from letting young collections absorb the agg
        # burst instead of promoting it. KGSPARK_JAVA_OPTS overrides.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("KGSPARK_JAVA_OPTS",
                               "-XX:+UnlockExperimentalVMOptions"
                               " -XX:G1NewSizePercent=30"
                               " -XX:G1MaxNewSizePercent=60"))
        # memory-backed shuffle dirs: local-mode shuffles otherwise hit the
        # sandbox VM's disk and serialize every wide stage behind I/O — a
        # real cluster shuffles over NVMe + network. tmpfs is the honest
        # local stand-in (the box has 126G of /dev/shm)
        .config("spark.local.dir",
                os.environ.get("KGSPARK_LOCAL_DIR", _default_local_dir()))
        .config("spark.ui.enabled", "false")
        # event-log knob for offline stage/job attribution
        # (tools/joblog_report.py); off unless a dir is given
        .config("spark.eventLog.enabled",
                "true" if os.environ.get("KGSPARK_EVENTLOG") else "false")
        .config("spark.eventLog.dir",
                os.environ.get("KGSPARK_EVENTLOG", "/tmp"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # collect_set/collect_list aggregations (edge provenance merge) run
        # as ObjectHashAggregate, whose sort-based fallback triggers at 128
        # distinct keys per task (!) — the dedup stages hold 10^4-10^5
        # classes per task, so the default silently degrades them to a full
        # sort on the fat 5-string class key. States are bounded (episode
        # arrays are capped), so hash aggregation is safe at a few million
        # in-flight groups per task.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(4 * 1024 * 1024))
        # local-bench corpora are a few hundred MB; the 128MB default split
        # would cap scan parallelism below the core count (on a real cluster
        # with TB-scale tables the default is fine — this only lowers the
        # floor, AQE coalesces tiny partitions back together)
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        # AQE's 64MB advisory target would coalesce our few-hundred-MB
        # shuffles down to a handful of tasks, idling most cores; 8MB keeps
        # mid-stage parallelism ≈ core count at bench scale while still
        # merging truly tiny partitions
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(8 * 1024 * 1024))
    )
    # ad-hoc conf passthrough for A/B experiments:
    # KGSPARK_EXTRA_CONF="spark.io.compression.codec=zstd;spark.x=y"
    extra = os.environ.get("KGSPARK_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
