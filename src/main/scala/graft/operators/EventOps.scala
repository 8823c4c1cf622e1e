package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators (SURVEY §2.G/H batch side): gap sessionization
  * and tumbling-window aggregation. The events parquet has shipped with
  * two timestamp encodings over time — TIMESTAMP(NANOS) (which Spark 4
  * only reads via the nanosAsLong legacy flag, arriving as a LongType of
  * nanos) and plain TIMESTAMP_MICROS (arriving as TIMESTAMP/NTZ) — so
  * the loader branches on the loaded schema and canonicalizes `ts` to a
  * microsecond TimestampType either way, exactly what the oracle's
  * `ts::TIMESTAMP` cast sees (session timezone is UTC, so the NTZ→TZ
  * cast is value-preserving).
  */
object EventOps {

  private val money = DecimalType(28, 6)

  /** events with ts canonicalized to a microsecond TimestampType,
    * whatever encoding the parquet footer carries (see canonicalTs).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    canonicalTs(Tables.events(s, dir))

  /** Schema-adaptive ts canonicalization: LongType means the scan ran
    * under nanosAsLong (nanos-as-int64 footer) → floor-truncate to
    * micros; TIMESTAMP / TIMESTAMP_NTZ footers need only a cast to the
    * session-zoned type (identity under the UTC session) so unix_micros
    * / window() / lag arithmetic downstream keep working unchanged.
    */
  def canonicalTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected INT64 nanos, " +
          "TIMESTAMP or TIMESTAMP_NTZ")
    }

  /** Per-event session assignment (user_id, event_id, ts, extras...,
    * session_id) — the pre-aggregation frame [[sessionize]] and the
    * path miner share: lag + running sum of session starts, one
    * shuffle on user_id.
    */
  private def sessionAssigned(s: SparkSession, dir: String,
      extras: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(Seq($"user_id", $"event_id", $"ts") ++ extras: _*)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum($"new_sess").over(wRun))
  }

  /** Gap-based sessionization (30-min inactivity): lag + running sum of
    * session starts — one shuffle on user_id, the canonical distributed
    * sessionize (streaming twin: EventsStream.sessionize).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    sessionAssigned(s, dir, Seq(col("value")))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        sum($"value".cast(money)).cast("double").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events),
      |g AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS start_ts, max(ts) AS end_ts,
      |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Tumbling 1-hour window aggregation per event type — the
    * batch-equivalent of the Structured Streaming pipeline in
    * graft.streaming.EventsStream (same plan shape modulo the watermark).
    */
  def streamWindowAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast(money)).cast("double").as("sum_value"))
      .select($"event_type", $"window.start".as("window_start"),
        $"n_events", $"sum_value")
      .orderBy($"event_type", $"window_start")
  }

  val streamWindowAggSql: String =
    """SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS window_start,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type, date_trunc('hour', ts::TIMESTAMP)
      |ORDER BY event_type, window_start""".stripMargin

  /** Funnel steps in conversion order. */
  private val funnelSteps = Seq("signup", "view", "click", "purchase")

  /** Funnel conversion — the canonical event-analytics ask: how many
    * users reach each step of signup → view → click → purchase, where
    * each step must occur STRICTLY AFTER the user's first qualifying
    * occurrence of the previous step. Per step, one per-user min-ts
    * aggregation joined to the previous step's frame — every join and
    * aggregation keys on user_id (co-partitioned, one shuffle key
    * throughout), the per-step counts are single-row aggregates, and
    * conversion rates come from a broadcast self-join of the 4-row
    * count frame — no partition-less window, no collect.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir).select($"user_id", $"event_type", $"ts")
    val first = e.where($"event_type" === funnelSteps.head)
      .groupBy($"user_id").agg(min($"ts").as("t"))
    val reached = funnelSteps.tail.scanLeft(first) { (prev, typ) =>
      e.where($"event_type" === typ)
        .join(prev.select($"user_id", $"t".as("pt")), "user_id")
        .where($"ts" > $"pt")
        .groupBy($"user_id").agg(min($"ts").as("t"))
    }
    val counts = funnelSteps.zip(reached).zipWithIndex.map {
      case ((typ, df), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(typ).as("event_type"), $"n_users")
    }.reduce(_ unionByName _)
    val prevCounts = counts.select(($"step" + 1).as("step"),
      $"n_users".as("n_prev"))
    counts.join(broadcast(prevCounts), Seq("step"), "left")
      .select($"step", $"event_type", $"n_users",
        round($"n_users".cast("double") / $"n_prev", 6).as("conv_rate"))
      .orderBy($"step")
  }

  val eventsFunnelSql: String = {
    val stepCtes = funnelSteps.zipWithIndex.map { case (typ, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(ts::TIMESTAMP) AS t FROM events
           |  WHERE event_type = '$typ' GROUP BY user_id)"""
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t
           |  FROM events e JOIN s$i ON e.user_id = s$i.user_id
           |  WHERE e.event_type = '$typ' AND e.ts::TIMESTAMP > s$i.t
           |  GROUP BY e.user_id)"""
    }.mkString(",\n")
    val unions = funnelSteps.zipWithIndex.map { case (typ, i) =>
      s"SELECT ${i + 1} AS step, '$typ' AS event_type, count(*) AS n_users FROM s${i + 1}"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${stepCtes.stripMargin},
       |counts AS (${unions})
       |SELECT c.step, c.event_type, c.n_users,
       |  round(CAST(c.n_users AS DOUBLE) / p.n_users, 6) AS conv_rate
       |FROM counts c LEFT JOIN counts p ON c.step = p.step + 1
       |ORDER BY c.step""".stripMargin
  }

  /** Retention cohorts — the other canonical event-analytics matrix:
    * users cohorted by first-seen day, per-(cohort, day-offset) active
    * user counts and retention rates. Two hash aggregations (first-seen
    * day per user; distinct user-days) joined on user_id, then one
    * count per matrix cell — the cohort matrix is bounded by
    * days² regardless of event volume, and cohort sizes ride a
    * broadcast join onto it.
    */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
      .select($"user_id", to_date(date_trunc("DAY", $"ts")).as("day"))
    val cohorts = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val sizes = cohorts.groupBy($"cohort_day").agg(count(lit(1)).as("cohort_n"))
    e.distinct()
      .join(cohorts, "user_id")
      .groupBy($"cohort_day", datediff($"day", $"cohort_day").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select($"cohort_day", $"day_offset", $"n_active",
        round($"n_active".cast("double") / $"cohort_n", 6).as("retention"))
      .orderBy($"cohort_day", $"day_offset")
  }

  val eventsRetentionSql: String =
    """WITH e AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP)::DATE AS day
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_day, count(*) AS cohort_n FROM cohorts GROUP BY cohort_day),
      |cells AS (
      |  SELECT c.cohort_day,
      |    CAST(date_diff('day', c.cohort_day, e.day) AS INT) AS day_offset,
      |    count(*) AS n_active
      |  FROM e JOIN cohorts c ON e.user_id = c.user_id
      |  GROUP BY 1, 2)
      |SELECT cohort_day, day_offset, n_active,
      |  round(CAST(n_active AS DOUBLE) / cohort_n, 6) AS retention
      |FROM cells JOIN sizes USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** DAU / MAU stickiness — the canonical activity-ratio metric: per
    * observed day, the distinct users active that day over the distinct
    * users active in the trailing 28 days. The trailing-window distinct
    * is NOT a range join (a BNLJ at scale) and NOT a per-day rescan:
    * each (user, active-day) row GENERATES its 28 future day
    * contributions (a bounded row-local explode), and one
    * countDistinct hash aggregation per target day does the rest —
    * two-phase partial aggregation, fan-out fixed at 28 whatever the
    * event volume, target days filtered to the observed-day frame (a
    * broadcast-tiny join).
    */
  def eventsDauMau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val du = events(s, dir)
      .select($"user_id", to_date(date_trunc("DAY", $"ts")).as("day"))
      .distinct()
    val days = du.select($"day").distinct()
    val contrib = du
      .select($"user_id", explode(sequence(lit(0), lit(27))).as("off"), $"day")
      .select($"user_id", date_add($"day", $"off").as("day"))
      .distinct()
    val mau = contrib.join(broadcast(days), "day")
      .groupBy($"day").agg(countDistinct($"user_id").as("mau"))
    val dau = du.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
    dau.join(mau, "day")
      .select($"day", $"dau", $"mau",
        round($"dau".cast("double") / $"mau", 6).as("stickiness"))
      .orderBy($"day")
  }

  val eventsDauMauSql: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP)::DATE AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM du),
      |contrib AS (
      |  SELECT DISTINCT user_id, day + CAST(o AS INTEGER) AS day
      |  FROM du, (SELECT unnest(generate_series(0, 27)) AS o) oo),
      |mau AS (
      |  SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS mau
      |  FROM contrib c JOIN days USING (day) GROUP BY c.day),
      |dau AS (
      |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      |  FROM du GROUP BY day)
      |SELECT day, dau, mau, round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
      |FROM dau JOIN mau USING (day) ORDER BY day""".stripMargin

  /** Session PATH mining — the top-10 3-step event-type paths taken
    * inside sessions (the "how do users actually move" query next to
    * the funnel's prescribed order): within each gap-session, every
    * consecutive event-type triple counts as one path occurrence.
    * Scale shape: the triples come from two `lead()`s over the SAME
    * (user_id)-partitioned window the sessionization itself uses — no
    * second shuffle, no per-session collect — and the path count is
    * one hash aggregation with TakeOrdered selection (ties break on
    * the path string). ORACLE=sql (identical window algebra in
    * DuckDB).
    */
  def sessionPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"session_id")
      .orderBy($"ts", $"event_id")
    sessionAssigned(s, dir, Seq(col("event_type")))
      .withColumn("t1", lead($"event_type", 1).over(w))
      .withColumn("t2", lead($"event_type", 2).over(w))
      .where($"t1".isNotNull && $"t2".isNotNull)
      .select(concat_ws(">", $"event_type", $"t1", $"t2").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path")
      .limit(10)
  }

  val sessionPathsSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type FROM events),
      |g AS (
      |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g),
      |tri AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w2 AS t1,
      |    lead(event_type, 2) OVER w2 AS t2
      |  FROM sess
      |  WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || t1 || '>' || t2 AS path, count(*) AS n
      |FROM tri WHERE t1 IS NOT NULL AND t2 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Per-event-type z-score anomaly detection — the monitoring query of
    * an event pipeline (a value 3σ off its type's distribution is a
    * broken emitter or a fraud signal): two passes, per-type moment
    * aggregates then a broadcast join back onto the stream. Float
    * discipline: values pre-round to integer micro-units and the
    * moments are exact decimal sums (order-independent at any
    * parallelism), and the 3σ GATE is evaluated entirely in that exact
    * arithmetic — (n·v − Σv)² > 9·(n·Σv² − (Σv)²) is the |z| > 3
    * predicate multiplied through by n²·σ², so the flag can never flip
    * on a last-ulp float divergence between engines. The reported z
    * itself ((n·v − Σv)/√(n·Σv² − (Σv)²)) is one IEEE division off the
    * exact aggregates, rounded to 6 dp. The moments frame is
    * #event-types-bounded → broadcast; outliers only in the output.
    */
  /** value → exact integer micro-units (decimal(38,0)) — shared by the
    * batch anomaly query and its streaming ingest twin.
    */
  private[graft] def microValue(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 1000000).cast("long").cast("decimal(38,0)")

  /** Per-event-type exact moments (n, Σv, Σv²) in micro-unit decimals —
    * the #types-bounded static side the streaming gate broadcasts.
    */
  private[graft] def valueMoments(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select($"event_type", microValue($"value").as("vi"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"vi").as("sv"),
        sum($"vi" * $"vi").as("svv"))
  }

  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
      .select($"event_id", $"event_type", $"value", microValue($"value").as("vi"))
    val stats = valueMoments(events(s, dir))
    val dev = $"n" * $"vi" - $"sv"
    val varn = $"n" * $"svv" - $"sv" * $"sv"
    e.join(broadcast(stats), "event_type")
      .where(dev * dev > lit(9) * varn)
      .select($"event_id", $"event_type", $"value",
        round(dev.cast("double") / sqrt(varn.cast("double")), 6).as("z"))
      .orderBy($"event_id")
  }

  val eventsAnomalySql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, value,
      |    CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT) AS vi
      |  FROM events),
      |stats AS (
      |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
      |    sum(vi) AS sv, sum(vi * vi) AS svv
      |  FROM e GROUP BY event_type)
      |SELECT e.event_id, e.event_type, e.value,
      |  round(CAST(s.n * e.vi - s.sv AS DOUBLE)
      |    / sqrt(CAST(s.n * s.svv - s.sv * s.sv AS DOUBLE)), 6) AS z
      |FROM e JOIN stats s USING (event_type)
      |WHERE (s.n * e.vi - s.sv) * (s.n * e.vi - s.sv)
      |  > 9 * (s.n * s.svv - s.sv * s.sv)
      |ORDER BY e.event_id""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_events_sessionize", sessionize, Some(sessionizeSql)),
    GraftQuery("q_stream_window_agg", streamWindowAgg, Some(streamWindowAggSql)),
    GraftQuery("q_events_funnel", eventsFunnel, Some(eventsFunnelSql)),
    GraftQuery("q_events_retention", eventsRetention, Some(eventsRetentionSql)),
    GraftQuery("q_events_dau_mau", eventsDauMau, Some(eventsDauMauSql)),
    GraftQuery("q_events_anomaly", eventsAnomaly, Some(eventsAnomalySql)),
    GraftQuery("q_session_paths", sessionPaths, Some(sessionPathsSql)))
}
