package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for fact⋈dim equi-joins (SURVEY §5): when one
  * join key carries a corpus-scale share of the fact rows, a plain
  * shuffle join lands that key's entire mass in ONE reduce task. Two
  * complementary remedies, both demonstrated in SkewSpec:
  *
  *  - AQE's runtime skew split (on by default in GraftSession): the
  *    sort-merge path re-plans oversized partitions into slices after
  *    the map stage measures them — zero code changes, but it only
  *    helps the SMJ path and needs runtime stats.
  *  - STATIC salting ([[saltedEquiJoin]]): the fact side fans its key
  *    space out S ways using a deterministic per-row salt, the dim side
  *    replicates S×, and the join key becomes (key, salt) — the hot
  *    key's rows spread across S tasks BY CONSTRUCTION, independent of
  *    stats, planner path, or join type. The cost is an S× blow-up of
  *    the (small) dim side — the classic trade a 100 TB pipeline makes
  *    when one user/document/source dominates.
  */
object SkewJoin {

  /** Equi-join `fact` to `dim` on `key`, salted `salts` ways. The salt
    * derives from `saltSource` (any fact column with per-row entropy —
    * an id, not the hot key itself), so the result is deterministic and
    * bit-identical to the unsalted join: each fact row meets each
    * matching dim row exactly once, under exactly one salt value.
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    // dim replicated once per salt value — a generator on the SMALL side
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The salted join as a registered query: events (15 distinct
    * user_ids over the whole stream — every key is hot by construction)
    * ⋈ customer, salted 8 ways, aggregated to per-segment event volume.
    * The oracle is the PLAIN join — salting must be invisible in the
    * result. The value sum runs over DECIMAL so the 8-way fan-out
    * cannot move a last-ulp double (order-independent algebra, same
    * rule as the revenue rollups).
    */
  def skewJoinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables.events(s, dir).select($"user_id", $"event_id", $"value")
    val dim = Tables.customer(s, dir)
      .select($"c_custkey".as("user_id"), $"c_mktsegment")
    saltedEquiJoin(fact, dim, "user_id", $"event_id", salts = 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value".cast("decimal(28,10)")).cast("double"), 6)
          .as("total_value"))
      .orderBy($"c_mktsegment")
  }

  val skewJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
      |    AS total_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q_skew_join", skewJoinQuery, Some(skewJoinSql)))
}
