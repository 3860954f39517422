package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sideload(): overlay hierarchical key-value configuration onto points
  * (reference sideload.go:31-250). The reference resolves an *ordered* list
  * of templated file paths per point and takes the first file that defines
  * each key; here the "files" are rows of a small config DataFrame
  * (key → values map) and each template level becomes one broadcast join —
  * the 100 TB-safe shape: the config is broadcast once, the point stream
  * never shuffles.
  */
object Sideload {

  /** @param df      point stream
    * @param levels  ordered (most-specific first) key expressions, each
    *                producing the lookup key for that hierarchy level
    *                (the reference's order() templates)
    * @param config  small DataFrame with columns (key: String,
    *                values: Map[String,String])
    * @param fields  output field → default value (the reference's
    *                .field(name, default)); first level that defines the
    *                key wins, else the default
    */
  def sideload(
      df: DataFrame,
      levels: Seq[Column],
      config: DataFrame,
      fields: Map[String, Column]): DataFrame = {
    val joined = levels.zipWithIndex.foldLeft(df) { case (acc, (keyExpr, i)) =>
      val cfg = broadcast(config.select(
        col("key").as(s"__sl_key_$i"), col("values").as(s"__sl_values_$i")))
      acc.join(cfg, keyExpr === col(s"__sl_key_$i"), "left")
    }
    val withFields = fields.foldLeft(joined) { case (acc, (name, default)) =>
      val candidates = levels.indices.map(i => col(s"__sl_values_$i").getItem(name))
      acc.withColumn(name, coalesce(candidates :+ default: _*))
    }
    withFields.drop(levels.indices.flatMap(i => Seq(s"__sl_key_$i", s"__sl_values_$i")): _*)
  }

  /** Load a sideload source directory (the reference's `file://` source,
    * sideload.go Service): every *.yml / *.json file under `root` becomes
    * one config row keyed by its root-relative path — extension included,
    * since order() templates name it ('t0/{{.t0}}.yml'). Documents are
    * flat scalar maps, values stringified ("2", "3.5", "why").
    *
    * Driver-side by design: sideload config is small and broadcast; the
    * point stream never moves. */
  def loadDir(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val stream = java.nio.file.Files.walk(base)
    val rows = try {
      stream.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) && {
          val n = p.toString; n.endsWith(".yml") || n.endsWith(".yaml") || n.endsWith(".json")
        })
        .map { p =>
          val rel = base.relativize(p).toString
          val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          val kv: Map[String, String] =
            if (rel.endsWith(".json"))
              mapper.readTree(text).fields().asScala
                .map(e => e.getKey -> e.getValue.asText).toMap
            else
              text.linesIterator.map(_.trim)
                .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains(":"))
                .map { l =>
                  val Array(k, v) = l.split(":", 2)
                  k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
                }.toMap
          (rel, kv)
        }.toSeq
    } finally stream.close()
    import spark.implicits._
    rows.toDF("key", "values")
  }
}
