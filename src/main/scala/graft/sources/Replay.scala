package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's replay fixture formats (integrations/
  * testdata, replay.go): `.srpl` stream replays — repeating triplets of
  * dbname / rpname / line-protocol — and `.brpl` batch replays —
  * concatenated pretty-printed JSON batch documents. These feed the golden
  * replay harness: fixture → pipeline → Result compare.
  */
object Replay {

  /** Split concatenated JSON documents by brace depth (string-aware). */
  private[sources] def splitJsonDocs(s: String): Seq[String] = {
    val docs = Seq.newBuilder[String]
    var depth = 0
    var start = -1
    var inStr = false
    var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (esc) esc = false
      else if (inStr) {
        if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { docs += s.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    docs.result()
  }

  private val pointSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("points", ArrayType(StructType(Seq(
      StructField("fields", MapType(StringType, StringType)),
      StructField("tags", MapType(StringType, StringType)),
      StructField("time", StringType)))))))

  /** Batch replay: one row per point with (batch_idx, name, tags, time,
    * fields). Each JSON document is one batch — `batch_idx` is its ordinal
    * in the file, preserving the replay's batch boundaries (the reference
    * feeds one BeginBatch…EndBatch per document). Point-level tags override
    * batch-level ones, as in the reference's batch JSON. */
  def readBrpl(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.textFile(path).collect().mkString("\n") // fixtures are small
    val docs = splitJsonDocs(raw).zipWithIndex.toDS().toDF("value", "batch_idx")
    docs.select(col("batch_idx"), from_json(col("value"), pointSchema).as("b"))
      .select(col("batch_idx"), col("b.name").as("name"), col("b.tags").as("batch_tags"),
        explode(col("b.points")).as("p"))
      .select(
        col("batch_idx"),
        col("name"),
        coalesce(col("p.tags"), col("batch_tags"), typedlit(Map.empty[String, String])).as("tags"),
        to_timestamp(col("p.time")).as("time"),
        col("p.fields").as("fields"))
  }

  /** Stream replay: repeating (dbname, rpname, line-protocol) triplets →
    * the canonical point frame plus db/rp columns. Triplet grouping is
    * positional, so the file is indexed once with zipWithIndex. */
  def readSrpl(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val grouped = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (l, i) => (i / 3, (i % 3, l)) }
      .groupByKey()
      .map { case (_, kvs) =>
        val m = kvs.toMap
        (m.getOrElse(0L, ""), m.getOrElse(1L, ""), m.getOrElse(2L, ""))
      }
    val withDbRp = grouped.toDF("db", "rp", "line")
      .as[(String, String, String)].flatMap { case (db, rp, line) =>
        LineProtocol.parseLine(line).map(p => (db, rp, p))
      }.toDF("db", "rp", "point")
    withDbRp.select(col("db"), col("rp"), col("point.*"))
      .withColumnRenamed("timeNs", "ts_ns")
      .withColumn("time", timestamp_micros(expr("ts_ns DIV 1000")))
  }
}
