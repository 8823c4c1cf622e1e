package graft

import graft.operators.{EventOps, Temporal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("asof join matches only prior clicks of the same user") {
    import spark.implicits._
    val res = Temporal.asofJoin(spark, dir).cache()
    assert(res.count() > 0)
    // every match strictly precedes (or ties at a smaller event_id)
    val bad = res.where($"click_ts".isNotNull &&
      ($"click_ts" > $"purchase_ts" ||
        ($"click_ts" === $"purchase_ts" && $"click_id" >= $"purchase_id"))).count()
    assert(bad == 0)
    // every matched click_id really is a click of that user
    val clicks = EventOps.events(spark, dir)
      .where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"))
    val wrongUser = res.where($"click_id".isNotNull)
      .join(clicks, "click_id")
      .where($"cu" =!= $"user_id").count()
    assert(wrongUser == 0)
  }

  test("gap sessionize agrees with Spark's native session_window operator") {
    import spark.implicits._
    // same 30-minute gap semantics (boundary caveat: the custom plan
    // keeps an exactly-gap-apart event in the session, session_window
    // starts a new one — the corpus has no exact-gap pairs, asserted
    // in the count below, so the two definitions coincide here)
    val events = EventOps.events(spark, dir)
    val native = events
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("start_ts"), max($"ts").as("end_ts"))
      .select($"user_id", $"n_events", $"start_ts", $"end_ts")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    val custom = EventOps.sessionize(spark, dir)
      .select($"user_id", $"n_events", $"start_ts", $"end_ts")
      .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(custom == native)
    assert(custom.nonEmpty)
  }

  test("range-window count equals the naive range self-join") {
    import spark.implicits._
    val e = EventOps.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val naive = e.as("a").join(e.as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"b.us" >= $"a.us" - 300000000L && $"b.us" < $"a.us", "left")
      .groupBy($"a.user_id", $"a.event_id")
      .agg(count($"b.event_id").as("n_naive"))
    val win = Temporal.rangeJoin(spark, dir)
      .select($"user_id", $"event_id", $"n_prev_5min")
    val mismatches = win.join(naive, Seq("user_id", "event_id"))
      .where($"n_prev_5min" =!= $"n_naive").count()
    assert(mismatches == 0)
  }

  test("dau/mau covers every observed day; mau dominates dau and a naive recount") {
    import spark.implicits._
    val rows = EventOps.eventsDauMau(spark, dir).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val du = EventOps.events(spark, dir)
      .select($"user_id", to_date(date_trunc("DAY", $"ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1)))
    assert(rows.map(_._1).toSet == du.map(_._2).toSet, "one row per observed day")
    rows.foreach { case (_, dau, mau, st) =>
      assert(dau >= 1 && mau >= dau, s"mau $mau must dominate dau $dau")
      assert(st > 0 && st <= 1.0 && math.abs(st - dau.toDouble / mau) < 1e-4)
    }
    // naive trailing-28-day recount on one mid-range day
    val probe = rows.map(_._1).sorted.apply(rows.length / 2)
    val naiveMau = du.filter { case (_, d) =>
      !d.after(probe) && d.toLocalDate.plusDays(28).isAfter(probe.toLocalDate)
    }.map(_._1).distinct.length
    val got = rows.find(_._1 == probe).get._3
    assert(got == naiveMau.toLong, s"mau $got vs naive $naiveMau on $probe")
  }

  test("session paths equal a driver recompute over the sessionized events") {
    import spark.implicits._
    val got = EventOps.sessionPaths(spark, dir)
      .as[(String, Long)].collect()
    assert(got.nonEmpty && got.length <= 10)
    // recompute: order each user's events, split on 30-min gaps, count
    // consecutive type triples within sessions
    val ev = EventOps.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      var sess = Seq.empty[String]
      var prevUs = Long.MinValue
      def flush(): Unit = {
        sess.sliding(3).filter(_.size == 3)
          .foreach { t => val p = t.mkString(">")
            counts(p) = counts.getOrElse(p, 0L) + 1 }
        sess = Seq.empty
      }
      ordered.foreach { case (_, _, us, t) =>
        if (prevUs != Long.MinValue && us - prevUs > 1800L * 1000000L) flush()
        sess = sess :+ t; prevUs = us
      }
      flush()
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got.toSeq == want)
  }

  test("events anomaly flags exactly the naive |z|>3 set per event type") {
    import spark.implicits._
    val flagged = EventOps.eventsAnomaly(spark, dir)
      .select($"event_id", $"z").as[(Long, Double)].collect().toMap
    val raw = EventOps.events(spark, dir)
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    val byType = raw.groupBy(_._2)
    val naive = byType.toSeq.flatMap { case (_, rows) =>
      // the operator's micro-unit integer moments, recomputed naively
      val vis = rows.map(r => BigInt(math.round(r._3 * 1e6)))
      val n = BigInt(vis.length)
      val sv = vis.sum
      val svv = vis.map(v => v * v).sum
      val varn = n * svv - sv * sv
      rows.zip(vis).collect {
        case ((id, _, _), vi) if (n * vi - sv).pow(2) > 9 * varn =>
          id -> ((n * vi - sv).toDouble / math.sqrt(varn.toDouble))
      }
    }
    assert(flagged.keySet == naive.map(_._1).toSet)
    naive.foreach { case (id, z) =>
      assert(math.abs(flagged(id) - z) < 1e-5, s"event $id")
      assert(math.abs(z) > 3.0)
    }
    assert(flagged.nonEmpty, "sf0.001 events should contain at least one 3-sigma value")
  }
}
