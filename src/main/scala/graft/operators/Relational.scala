package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational heads: flagship aggregation, broadcast-join rollup, window
  * top-k. Monetary aggregates are summed as DECIMAL (order-independent,
  * so results are bit-identical across any partitioning / shuffle order —
  * a double sum would drift with partition count) and cast back to double.
  */
object Relational {

  private val money = DecimalType(28, 6)

  /** Pricing-summary aggregation (TPC-H Q1 shape) over lineitem.
    * Single hash aggregation with map-side partial aggregation; the
    * shipdate filter is pushed into the parquet scan.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast(money)).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast(money)).cast("double").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(money))
          .cast("double").as("sum_disc_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
          .cast(money)).cast("double").as("sum_charge"),
        (sum($"l_quantity".cast(money)).cast("double") / count(lit(1))).as("avg_qty"),
        (sum($"l_extendedprice".cast(money)).cast("double") / count(lit(1))).as("avg_price"),
        (sum($"l_discount".cast(money)).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue rollup across orders ⋈ customer ⋈ nation ⋈ region with every
    * dimension broadcast — no shuffle on the fact side except the final
    * small aggregation.
    */
  def joinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum($"o_totalprice".cast(money)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")
  }

  val joinBroadcastSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Top-3 orders per customer by price — one shuffle on o_custkey, ties
    * broken on o_orderkey so ranks are deterministic.
    */
  def windowTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"o_custkey", $"rk")
  }

  val windowTopKSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** Interpolated percentiles of quantity/price per return flag — one
    * sort-based aggregate (Spark's exact `percentile`); the approximate
    * path at 100 TB is `percentile_approx`/t-digest with the same shape.
    */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the exact percentile buffers are CPU-bound while sf0.1's lineitem
    // plans 3 scan splits — spread the single-reference aggregation
    // input (Tables.fanOutWide: no-op once the corpus plans >= cores
    // splits); exact percentile is a sorted-buffer aggregate, so the
    // result is partitioning-independent
    Tables.fanOutWide(Tables.lineitem(s, dir), col("l_orderkey"))
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.95)").as("qty_p95"),
        expr("percentile(l_extendedprice, 0.5)").as("price_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("price_p95"))
      .orderBy($"l_returnflag")
  }

  val percentilesSql: String =
    """SELECT l_returnflag,
      |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS qty_p50,
      |  CAST(quantile_cont(l_quantity, 0.95) AS DOUBLE) AS qty_p95,
      |  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS price_p50,
      |  CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS price_p95
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch-based percentiles — the scale swap-in [[percentiles]]
    * documents: `percentile_approx` (Greenwald-Khanna) keeps a bounded
    * per-group sketch instead of buffering the group's values, so the
    * same matrix costs O(groups × sketch) memory at any corpus size.
    * GK internals differ across engines, so the REGISTERED shape is
    * [[percentilesApproxGated]] (envelope boolean); this raw frame is
    * the spec surface (RelationalSpec/MiscSpec bound the relative error
    * against the exact operator at ≤1% per cell).
    */
  def percentilesApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("qty_p50"),
        expr("percentile_approx(l_quantity, 0.95, 10000)").as("qty_p95"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("price_p50"),
        expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("price_p95"))
      .orderBy($"l_returnflag")
  }

  /** The REGISTERED q_percentiles_approx shape — hash-checked since
    * round 17 by the gated-boolean convention (the q_stream_sketch_store
    * precedent): the exact interpolated percentiles are plain SQL, and
    * the GK sketch rides as ONE boolean ANDing the four per-cell 1%
    * envelopes (|approx − exact| · 100 ≤ exact — deterministic
    * Spark-side arithmetic on two deterministic aggregates), pinned
    * TRUE by the oracle: a sketch cell drifting past 1% flips the
    * boolean and breaks the hash. Both aggregate sets run in the SAME
    * groupBy — one shuffle, the sketch check costs no extra pass.
    */
  def percentilesApproxGated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def ok(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      abs(a - e) * 100 <= e
    // fanOutWide: the percentiles rationale. The GK sketch values can
    // shift with partitioning, but the REGISTERED columns are the exact
    // percentiles plus the 1%-envelope boolean, and the sketch's 1e-4
    // error bound holds under any merge topology — the boolean cannot
    // flip (RelationalSpec bounds the per-cell error)
    Tables.fanOutWide(Tables.lineitem(s, dir), col("l_orderkey"))
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.95)").as("qty_p95"),
        expr("percentile(l_extendedprice, 0.5)").as("price_p50"),
        expr("percentile(l_extendedprice, 0.95)").as("price_p95"),
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("a1"),
        expr("percentile_approx(l_quantity, 0.95, 10000)").as("a2"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("a3"),
        expr("percentile_approx(l_extendedprice, 0.95, 10000)").as("a4"))
      .select($"l_returnflag", $"qty_p50", $"qty_p95", $"price_p50", $"price_p95",
        (ok($"a1", $"qty_p50") && ok($"a2", $"qty_p95") &&
          ok($"a3", $"price_p50") && ok($"a4", $"price_p95"))
          .as("approx_within_1pct"))
      .orderBy($"l_returnflag")
  }

  val percentilesApproxGatedSql: String =
    """SELECT l_returnflag,
      |  CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS qty_p50,
      |  CAST(quantile_cont(l_quantity, 0.95) AS DOUBLE) AS qty_p95,
      |  CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS price_p50,
      |  CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS price_p95,
      |  TRUE AS approx_within_1pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** The REGISTERED q_percentiles_by_source — the scale swap-in AS the
    * plan: per-source document-length quantiles via `percentile_approx`
    * (Greenwald-Khanna, bounded per-group sketch — O(groups × sketch)
    * memory at any corpus size, where the exact `percentile` would
    * buffer every group's values). Hash-checked, not rows-only: at
    * accuracy 10000 ≫ group size the GK summary retains every sample
    * and its rank rule returns exactly the discrete quantile — the
    * smallest element with rank ≥ ⌈p·n⌉ — which is DuckDB's
    * `quantile_disc` (verified across sizes, duplicates, and all four
    * percentiles). So the 100 TB plan shape is what the gate checks; at
    * corpus scale only the accuracy/exactness trade moves, never the
    * plan.
    */
  def percentilesBySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"source")
      .agg(
        expr("percentile_approx(n_chars, 0.25, 10000)").as("chars_p25"),
        expr("percentile_approx(n_chars, 0.5, 10000)").as("chars_p50"),
        expr("percentile_approx(n_chars, 0.75, 10000)").as("chars_p75"),
        expr("percentile_approx(n_chars, 0.95, 10000)").as("chars_p95"))
      .orderBy($"source")
  }

  val percentilesBySourceSql: String =
    """SELECT source,
      |  quantile_disc(n_chars, 0.25) AS chars_p25,
      |  quantile_disc(n_chars, 0.5) AS chars_p50,
      |  quantile_disc(n_chars, 0.75) AS chars_p75,
      |  quantile_disc(n_chars, 0.95) AS chars_p95
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Region → nation revenue rollup with subtotals (GROUPING SETS):
    * one pass producing all aggregation levels.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(sum($"o_totalprice".cast(money)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val rollupRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Fixed-width histogram of order totals — explicit bucket arithmetic
    * (identical in both engines) rather than engine-specific
    * width_bucket; one hash aggregation.
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = 0.0; val hi = 550000.0; val nb = 20
    Tables.orders(s, dir)
      .select(least(floor(($"o_totalprice" - lo) / ((hi - lo) / nb)), lit(nb - 1))
        .cast("int").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  val histogramSql: String =
    """SELECT CAST(least(floor((o_totalprice - 0.0) / (550000.0 / 20)), 19) AS INT)
      |  AS bucket, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** The CUSTOM-OPERATOR twin of [[windowTopK]] — same rows, same
    * oracle, different physical plan: the declarative row_number window
    * must fully SORT every customer's orders before ranking, while
    * [[graft.plans.TopKPerKey]] (logical node → SparkStrategy →
    * UnaryExecNode, SURVEY §4 path (c)) streams each shuffled group
    * through a size-3 bounded heap — O(n log k), no sort buffer. At
    * 100 TB that heap replaces the dominant per-group sort. The rank
    * column the oracle expects is re-derived by a window over the
    * ALREADY-REDUCED ≤3-rows-per-customer frame (trivial groups), so
    * the oracle gate proves the custom operator invisible — the
    * q_skew_join convention applied to a custom physical operator.
    */
  def windowTopKHeap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val top = graft.plans.TopKPerKey(base, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    top.withColumn("rk", row_number().over(w))
      .orderBy($"o_custkey", $"rk")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_histogram", histogram, Some(histogramSql)),
    GraftQuery("q1_agg", q1Agg, Some(q1AggSql)),
    GraftQuery("q_join_broadcast", joinBroadcast, Some(joinBroadcastSql)),
    GraftQuery("q_window_topk", windowTopK, Some(windowTopKSql)),
    GraftQuery("q_window_topk_heap", windowTopKHeap, Some(windowTopKSql)),
    GraftQuery("q_percentiles", percentiles, Some(percentilesSql)),
    GraftQuery("q_percentiles_approx", percentilesApproxGated,
      Some(percentilesApproxGatedSql)),
    GraftQuery("q_percentiles_by_source", percentilesBySource,
      Some(percentilesBySourceSql)),
    GraftQuery("q_rollup_revenue", rollupRevenue, Some(rollupRevenueSql)))
}
