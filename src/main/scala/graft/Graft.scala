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

  /** The events stream table. Its `ts` is nanosecond-precision parquet which
    * Spark cannot represent; we surface it as `time: timestamp` truncated to
    * microseconds (plus the raw `ts_ns` long for exact arithmetic). The conf
    * is runtime-set so this works under driver-created sessions too.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // integral DIV: double division would lose precision at epoch-ns scale
      .withColumn("time", timestamp_micros(expr("ts_ns DIV 1000")))
  }
}
