package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/session warm-up (codegen, parquet reader JIT) so it
    // doesn't land on the first query
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // SparkEntry.all order (not Map hash order): timings stay comparable
    // across rounds even as queries are added, and a noop-format write
    // executes every projection a count() would let Catalyst prune away
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.all.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += q.name
        System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal timings keep the whole line under ~1.9 KB so a
    // tail-capture of the run log still contains the complete JSON
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // failed names ride the JSON line: a swallowed exception otherwise
    // reads as a suspiciously fast query instead of a broken one
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
