package graft.queries

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic analytical shapes over the TPC-H-ish tables — these are the
  * bench headliners and the place where the 100 TB posture shows: filters
  * expressed on scan columns (pushdown), small dimensions broadcast, and
  * aggregations that partial-aggregate map-side before the single shuffle.
  */
object TpchQueries {

  /** Pricing summary (TPC-H Q1 shape). */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY 1, 2 ORDER BY 1, 2""".replaceAll("\\s+", " ")

  /** Revenue by nation: broadcast-joined dims (customer⋈nation⋈orders). */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val customer = Graft.table(s, dir, "customer")
    val nation = Graft.table(s, dir, "nation")
    val orders = Graft.table(s, dir, "orders")
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum("o_totalprice"), 4).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  val revenueByNationSql: String =
    """SELECT n_name, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
       FROM orders JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY 1 ORDER BY 1""".replaceAll("\\s+", " ")

  /** Selective filter + projection — the pushdown showcase. */
  def selectiveScan(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "lineitem")
      .filter(col("l_quantity") > 49.5 && col("l_discount") < 0.01)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("lineno"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy("l_orderkey", "lineno")

  val selectiveScanSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS lineno, l_quantity, l_extendedprice
       FROM lineitem WHERE l_quantity > 49.5 AND l_discount < 0.01
       ORDER BY 1, 2""".replaceAll("\\s+", " ")

  /** Local-supplier revenue by nation within a region/year (TPC-H Q5
    * shape): the multi-join showcase — dims (region⋈nation, customer,
    * supplier) broadcast against the two fact tables, one shuffle join
    * between orders and lineitem on orderkey, AQE free to re-plan; the
    * local-supply condition (customer and supplier share the nation)
    * prunes after the broadcasts. */
  def revenueByRegionNation(s: SparkSession, dir: String): DataFrame = {
    val nations = Graft.table(s, dir, "nation")
      .join(Graft.table(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("n_nationkey"), col("n_name"))
    val orders = Graft.table(s, dir, "orders")
      .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    Graft.table(s, dir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Graft.table(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Graft.table(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val revenueByRegionNationSql: String =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
         AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
       GROUP BY 1 ORDER BY 1""".replaceAll("\\s+", " ")

  /** Top customer per nation by account balance — ranked window shape. */
  def topCustomerPerNation(s: SparkSession, dir: String): DataFrame = {
    val customer = Graft.table(s, dir, "customer")
    val nation = Graft.table(s, dir, "nation")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("n_name")).orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("n_name"), col("c_custkey"), col("c_acctbal"), col("rk").cast("long").as("rk"))
      .orderBy("n_name", "rk")
  }

  val topCustomerPerNationSql: String =
    """SELECT n_name, c_custkey, c_acctbal, CAST(rk AS BIGINT) AS rk FROM (
         SELECT n_name, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
         FROM customer JOIN nation ON c_nationkey = n_nationkey)
       WHERE rk <= 3 ORDER BY 1, 4""".replaceAll("\\s+", " ")
}
