package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Scratch profiler: run named queries once, sum Spark job wall time by
  * job group/description, print jobs sorted by cost. NOT part of the
  * round's surface — measurement scaffolding only.
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val jobs = mutable.LinkedHashMap[Int, (Long, String)]()
    val done = mutable.LinkedHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time,
          j.stageInfos.sortBy(_.stageId).lastOption.map(_.name.takeWhile(_ != '\n')).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        done(j.jobId) = j.time
    })
    SparkEntry.all.filter(q => args.contains(q.name)).foreach { q =>
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val rows = jobs.toSeq.flatMap { case (id, (st, site)) =>
        done.get(id).map(en => (id, en - st, site))
      }
      println(f"PROF ${q.name} wall=$wall%.2f s, ${rows.size} jobs, " +
        f"jobsum=${rows.map(_._2).sum / 1e3}%.2f s")
      rows.sortBy(-_._2).take(30).foreach { case (id, ms, site) =>
        println(f"  job $id%4d ${ms / 1e3}%7.3f s  $site")
      }
      val bySite = rows.groupBy(_._3).map { case (s, rs) =>
        (s, rs.map(_._2).sum, rs.size)
      }.toSeq.sortBy(-_._2)
      bySite.take(20).foreach { case (s, ms, n) =>
        println(f"  SITE ${ms / 1e3}%7.3f s  n=$n%3d  $s")
      }
      jobs.clear(); done.clear()
    }
    spark.stop()
  }
}
