package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiling main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Dedup.shingles(spark, dir)
    time("sh.count")(println("rows=" + sh.count()))
    val wFreq = Window.partitionBy($"shingle")
    val wDoc = Window.partitionBy($"doc_id")
    val wRank = Window.partitionBy($"doc_id").orderBy($"freq".asc, $"shingle".asc)
    val ranked = sh.withColumn("freq", count(lit(1)).over(wFreq))
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
    val prefix = ranked.where(($"rnk" - 1) * 10 <= lit(5) * $"n")
      .select($"doc_id", $"shingle", $"n")
    time("prefix.count")(println("prefix=" + prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id" &&
          lit(5) * $"a.n" <= lit(10) * $"b.n" &&
          lit(5) * $"b.n" <= lit(10) * $"a.n")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        $"a.n".as("na"), $"b.n".as("nb"))
    time("cand.count")(println("cand=" + cand.count()))
    time("cand.distinct.count")(println("cand.distinct=" + cand.distinct().count()))
    time("full")(Dedup.ngramJaccardPrefix(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("full2")(Dedup.ngramJaccardPrefix(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("plain")(Dedup.ngramJaccard(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
