"""SparkSession factory tuned for both local testing and large clusters.

Scale notes (the configs below are chosen for 100 TB-class inputs, not just
the local fixtures):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic join-strategy switching replace hand-tuned partition counts when
  the same code moves from local[32] to a 1000-executor cluster.
- `spark.sql.shuffle.partitions` is only the *initial* value; AQE coalesces
  down on small data and the advisory partition size governs large data.
- Arrow enabled for every pandas-UDF seam (the map stage is Arrow-batched,
  never row-at-a-time Python).
- Parquet filter pushdown / column pruning are left at defaults (on); all
  engine operators express filters/projections declaratively so Catalyst
  can push them into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settable at runtime; required because the driver fixtures write
# INT64(TIMESTAMP(NANOS)) which Spark only reads as long via this flag.
_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # runtime-settable: externally-created sessions (the driver's) default
    # to 200 shuffle partitions — size to the machine instead; AQE
    # coalesces further when data is small.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # SPARK_GRAFT_AQE=false is the config-invariance probe hook: AQE
    # rewrites plan shapes at runtime (partition coalescing, skew-join
    # splitting, join demotion), so proving the full gate passes with it
    # OFF pins result hashes as AQE-independent — the last
    # planner-nondeterminism axis after row order / partition count / TZ.
    "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "true"),
    # SPARK_GRAFT_MAX_PARTITION_BYTES is the split-invariance probe hook
    # (tools/split_invariance.py): shrinking it forces row-group-level
    # input splits on the multi-file fixture, exercising the
    # split-boundary axis a real cluster always perturbs. Default: Spark's
    # 128m (sized so sf0.1-class partitions fit executor memory; at
    # 100 TB the same default yields ~800k splits — the desired shape).
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"
    ),
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Don't coalesce small shuffles below 64 KB partitions: CPU-heavy
    # Python/regex stages need parallelism even when shuffle bytes are
    # small. At production partition sizes (≫1 MB) this has no effect.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Align Spark's whole-stage-codegen bail-out with HotSpot's compile
    # limit. The JIT refuses to compile methods over 8000 bytecodes
    # (-XX:+DontCompileHugeMethods), so a fused doConsume bigger than that
    # runs as INTERPRETED bytecode forever — measured 3x slower on the
    # 64-term unrolled-cosine stage (two distinct array operands defeat
    # subexpression sharing and blow past 8000; one-operand expressions
    # stay under). At 8000 Spark abandons fusion for exactly the stages
    # the JVM would never compile and per-operator codegen (whose split
    # methods DO stay under the limit) runs JIT-compiled instead.
    "spark.sql.codegen.hugeMethodLimit": "8000",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


#: The locale pin appended to driver/executor JVM options (see get_spark).
LOCALE_PIN = "-Duser.language=en -Duser.country=US"


def _java_options() -> str:
    """Deployment JVM options (env) + the mandatory locale pin."""
    base = os.environ.get("SPARK_GRAFT_JAVA_OPTS", "").strip()
    return (base + " " + LOCALE_PIN).strip()


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply engine confs to an externally-created session (the driver's)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder path sets it instead
    # Tempdir retention (once per process): ephemeral pmr_* artifacts
    # whose lifetime must outlast their query call age out here instead
    # of accumulating forever (sources/retention.py). Cross-process TTL
    # hazard: another session's artifact idle past the TTL (no mtime
    # anywhere in its tree within PMR_TMP_TTL_SEC, default 6h) is swept
    # even if that session still holds a lazy DataFrame over it — raise
    # PMR_TMP_TTL_SEC in environments running sessions longer than that.
    from .sources.retention import sweep_once

    sweep_once()
    return spark


# Interactive-mode threshold: inputs under this many bytes (compressed,
# on disk) take the small-query path in tune_for_input.
INTERACTIVE_BYTES = int(os.environ.get("SPARK_GRAFT_INTERACTIVE_BYTES", 1 << 30))


def input_bytes(path: str) -> int:
    """Total on-disk bytes under ``path`` (a file or a fixture dir)."""
    if os.path.isfile(path):
        return os.stat(path).st_size
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.stat(os.path.join(root, f)).st_size
            except OSError:
                pass
    return total


#: What the most recent tune_for_input call decided (regime, input
#: bytes, shuffle partitions) — read by bench artifacts, never by queries.
LAST_TUNE: dict = {}


def tune_for_input(spark: SparkSession, path_or_bytes) -> SparkSession:
    """Size runtime execution confs to the INPUT, not just the machine.

    Two regimes, split at ``INTERACTIVE_BYTES`` (1 GiB on-disk default,
    ``SPARK_GRAFT_INTERACTIVE_BYTES`` overrides):

    - **Large inputs** (the 100 TB design point): production defaults —
      AQE on (runtime coalescing / skew splits / join demotion decided
      from real shuffle stats), initial shuffle partitions = cores.
      This branch restores the ``_RUNTIME_CONFS`` values, so calling
      the helper is always safe.
    - **Interactive inputs**: AQE's value is re-planning from runtime
      statistics, and its cost is a scheduler round per stage — a pure
      fixed latency when the right partition count is already decidable
      from input size up front (measured on the sf0.1 headline set:
      ~0.5-0.65 s of a ~6 s total is AQE re-planning + over-partitioned
      shuffle waves). So: AQE off, shuffle partitions =
      clamp(bytes // 2 MiB, 4, cores) — the same small-query fast path
      every interactive warehouse engine implements.

    Correctness is invariant to this switch BY MEASUREMENT, not hope:
    the committed CONFIG_INVARIANCE.json probes re-run the full
    cross-engine gate with AQE disabled (`aqe_off`), with perturbed
    shuffle-partition counts (`shuffle7`, `local8`) and under permuted
    row order (tools/order_invariance.py) — 131-132/131-132 green on
    every axis, so the two regimes produce identical result hashes.
    bench.py calls this once per run; the driver's own correctness
    sessions keep production confs.
    """
    nbytes = (
        path_or_bytes
        if isinstance(path_or_bytes, int)
        else input_bytes(str(path_or_bytes))
    )
    cores = default_parallelism()
    if nbytes >= INTERACTIVE_BYTES:
        spark.conf.set("spark.sql.adaptive.enabled", _RUNTIME_CONFS["spark.sql.adaptive.enabled"])
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))
        regime, parts = "production", cores
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        parts = max(4, min(cores, nbytes // (2 << 20)))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        regime = "interactive"
    # Which branch fired was previously implicit in the artifacts that
    # cite this helper (r8 verdict polish item): record it for callers
    # (bench.py embeds it in its JSON line).
    LAST_TUNE.clear()
    LAST_TUNE.update(
        regime=regime, input_bytes=int(nbytes), shuffle_partitions=int(parts)
    )
    return spark


def get_spark(app_name: str = "proactive_map_reduce_spark") -> SparkSession:
    cpus = default_parallelism()
    # Python WORKERS must be able to import this package: the driver's
    # sys.path (examples/ scripts insert the repo dir) is NOT inherited
    # by executor workers, so a pandas UDF that references a package
    # function (the stand-in tokenizer's py_token_id) deserializes with
    # ModuleNotFoundError whenever the driver runs from another cwd.
    # Exporting PYTHONPATH BEFORE the JVM launches fixes every fork of
    # the worker daemon; on a real cluster the packaged equivalent is
    # --py-files/a wheel, this is the local-mode analog. Must run before
    # getOrCreate — the JVM captures its environment at launch.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Pin the JVM default locale: Spark's non-ASCII lower()/upper()
        # path delegates to java.lang.String.toLowerCase(Locale.getDefault()),
        # and under a Turkish-locale JVM 'I'→'ı' / 'İ'→'i' — which would
        # break the pinned engine-agreement contract for the İ full-casing
        # oracle mirror (oracles/reference_ops.py). Locale is a JVM-launch
        # property, not a runtime conf, so it rides on extraJavaOptions;
        # tools/config_invariance.py probes a tr_TR.UTF-8 environment to
        # prove the pin holds. Deployment-provided JVM options (GC flags,
        # add-opens, agent jars) come first via SPARK_GRAFT_JAVA_OPTS so
        # the pin APPENDS rather than clobbers (ADVICE r7) — last-wins
        # for -D flags keeps the locale authoritative either way.
        .config("spark.driver.extraJavaOptions", _java_options())
        .config("spark.executor.extraJavaOptions", _java_options())
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return apply_runtime_confs(builder.getOrCreate())
