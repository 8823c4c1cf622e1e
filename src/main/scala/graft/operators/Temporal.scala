package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY §2.G): as-of join and range join,
  * both expressed as single window passes over the user-partitioned
  * event stream — the formulations that scale (one shuffle on the
  * partition key, no nested-loop join, no per-group sort beyond the
  * window's own range partition).
  */
object Temporal {

  /** As-of join: each purchase event matched to the same user's most
    * recent strictly-preceding click (ties on ts broken by event_id).
    * The classic union-and-carry-forward formulation: last non-null
    * click carried over the (ts, event_id) order — no join at all.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    EventOps.events(s, dir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .withColumn("click_id",
        last(when($"event_type" === "click", $"event_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts",
        last(when($"event_type" === "click", $"ts"), ignoreNulls = true).over(w))
      .where($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        $"click_id", $"click_ts")
      .orderBy($"user_id", $"purchase_id")
  }

  val asofJoinSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER win AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER win AS click_ts
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
      |  click_id, click_ts
      |FROM w WHERE event_type = 'purchase'
      |ORDER BY user_id, purchase_id""".stripMargin

  /** Range join: per event, how many events the same user produced in
    * the preceding 5 minutes — a RANGE window frame over the microsecond
    * epoch, not a self-join (the window needs one shuffle; the naive
    * range self-join shuffles the square).
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-300000000L, -1L)
    EventOps.events(s, dir)
      .select($"user_id", $"event_id", $"ts")
      .withColumn("n_prev_5min", count(lit(1)).over(w))
      .orderBy($"user_id", $"event_id")
  }

  val rangeJoinSql: String =
    """SELECT user_id, event_id, ts::TIMESTAMP AS ts,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
      |    RANGE BETWEEN 300000000 PRECEDING AND 1 PRECEDING) AS n_prev_5min
      |FROM events ORDER BY user_id, event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_asof_join", asofJoin, Some(asofJoinSql)),
    GraftQuery("q_range_join", rangeJoin, Some(rangeJoinSql)))
}
