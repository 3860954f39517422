package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session + table plumbing for the graft engine.
  *
  * Design notes (100 TB posture): everything here is declarative DataFrame
  * API so Catalyst can push filters/prune columns into the parquet scan; we
  * deliberately set shuffle partitions from the env (32 on the local test
  * rig, thousands on a real cluster) and lean on AQE for runtime coalescing
  * and skew-join handling.
  */
object Graft {

  /** Build the standard session. `local[32]` on the test rig; on a real
    * cluster the master/deploy config comes from spark-submit and these
    * settings remain sane defaults.
    */
  def session(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark's parquet
      // reader rejects; read it as Long nanos and convert ourselves.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // Let the planner pick shuffled-hash over sort-merge when its size
      // conditions hold (guide §3.1/§9): the self-join family (LSH bands,
      // simhash chunks, PPJoin candidates) joins two same-keyed sides
      // where per-partition hash builds beat sorting both sides. Scale
      // note: this is the guide's recommended batch-ETL baseline, not a
      // local[32] trick — SHJ is only CHOSEN when a side's per-partition
      // build fits memory, and sort-merge remains the fallback.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** All driver-provided tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The events stream table, surfaced with a stable schema regardless of
    * how the generator stored `ts`:
    *   - `time: timestamp` (µs precision, UTC session) for window/time ops;
    *   - `ts_ns: long` (epoch nanoseconds) for exact integer arithmetic.
    * Two physical layouts exist across driver testdata generations: INT64
    * TIMESTAMP(NANOS) (read as Long via the legacy nanosAsLong conf) and
    * plain TIMESTAMP(MICROS) (read as timestamp / timestamp_ntz). Both
    * normalize to the same logical columns, and the DuckDB oracle's
    * `epoch_us(ts)` agrees with `ts_ns DIV 1000` under either layout.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // Same projection under either layout: every raw column with `ts`
    // replaced by `ts_ns` in place, then `time` appended.
    def shaped(tsNs: org.apache.spark.sql.Column): DataFrame =
      raw
        .select(raw.columns.map {
          case "ts" => tsNs.as("ts_ns")
          case c    => col(c)
        }.toIndexedSeq: _*)
        // integral DIV: double division would lose precision at epoch-ns
        .withColumn("time", timestamp_micros(expr("ts_ns DIV 1000")))
    raw.schema("ts").dataType match {
      case LongType =>
        // INT64 TIMESTAMP(NANOS) read as Long via the legacy nanosAsLong conf
        shaped(col("ts"))
      case TimestampType | TimestampNTZType =>
        // µs timestamp (NTZ reads as UTC wall-clock under the UTC session)
        shaped(unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      case other =>
        throw new IllegalArgumentException(
          s"events.parquet has unsupported ts type $other; expected INT64 " +
            "TIMESTAMP(NANOS) (surfaced as long) or TIMESTAMP(MICROS)")
    }
  }
}
