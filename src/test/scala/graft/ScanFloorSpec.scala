package graft

import java.util.concurrent.ConcurrentHashMap

import graft.operators.Relational
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §8b's "known local-bench floor" as a DEMONSTRATED property:
  * the driver's single-file single-row-group parquet pins every scan
  * (and the narrow stage above it) to ONE producing task, and that is
  * an input-layout property, not a plan property — the SAME q1_agg plan
  * over an 8-file copy of the same rows fans its scan out to 8 reading
  * tasks and returns identical results. This is why the plans carry no
  * blanket repartition() (a full-table shuffle at 100 TB) to paper over
  * a 10 MB local file.
  *
  * The session emulates at-scale split sizing (tiny maxPartitionBytes /
  * openCostInBytes — locally ALL files sit far below the 128 MB
  * default, which would pack any layout into one split): with splits
  * smaller than a file, parquet can still only deliver a row group to
  * the ONE split holding its midpoint, so a single-row-group file feeds
  * one task no matter how finely it is split — reading tasks, not
  * nominal splits, are the honest metric.
  */
class ScanFloorSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.01"

  private val multiRoot = s"/tmp/graft_multifile_${ProcessHandle.current().pid()}"

  lazy val spark: SparkSession = GraftSession.builder("local[8]", 8)
    .config("spark.sql.files.maxPartitionBytes", 256 * 1024)
    .config("spark.sql.files.openCostInBytes", 1024)
    .getOrCreate()

  override def afterAll(): Unit = {
    spark.stop()
    // the written copy is per-pid scratch — delete it so repeated runs
    // don't accumulate under /tmp
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(multiRoot))
  }

  /** Tasks of one action's FIRST (scan) stage that actually read rows. */
  private def readingScanTasks(f: => Unit): Int = {
    val readers = new ConcurrentHashMap[Int, Integer]()
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null && t.taskMetrics.inputMetrics.recordsRead > 0)
          readers.merge(t.stageId, 1, (a, b) => a + b)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      f
      // listener events are async and the bus is private[spark]: poll
      // until at least one reading task is recorded AND the counts are
      // stable (an empty map can look "stable" while the bus drains)
      var last = -1
      var same = 0
      var spins = 0
      while ((last <= 0 || same < 3) && spins < 200) {
        val now = readers.values().stream().mapToInt(_.intValue()).sum()
        if (now == last) same += 1 else { same = 0; last = now }
        spins += 1
        Thread.sleep(50)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val byStage = readers.asScala.toMap
    assert(byStage.nonEmpty, "no reading tasks recorded — listener bus never drained")
    byStage(byStage.keys.min).intValue()
  }

  private def collected(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("q1_agg scan parallelism follows the input layout, results don't") {
    Tables.lineitem(spark, dir).repartition(8)
      .write.mode("overwrite").parquet(s"$multiRoot/lineitem.parquet")
    // the honest expectation is one reading task per NON-EMPTY written
    // data file (an empty output partition writes a row-group-free file
    // no scan task ever reports reading) — count files that actually
    // hold rows instead of assuming repartition(8) produced 8
    val dataFiles = spark.read.parquet(s"$multiRoot/lineitem.parquet")
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count().toInt

    var singleRes: Seq[String] = null
    var multiRes: Seq[String] = null
    val singleTasks = readingScanTasks {
      singleRes = collected(Relational.q1Agg(spark, dir))
    }
    val multiTasks = readingScanTasks {
      multiRes = collected(Relational.q1Agg(spark, multiRoot))
    }
    // one file, one row group → one task does ALL the reading
    assert(singleTasks == 1, s"single-file scan had $singleTasks reading tasks")
    // same plan, N files → the scan fans out to one reader per file
    assert(dataFiles >= 2, s"layout copy produced only $dataFiles data files")
    assert(multiTasks == dataFiles,
      s"multi-file scan had $multiTasks reading task(s), expected $dataFiles")
    // layout changes parallelism, never the answer
    assert(singleRes == multiRes && singleRes.nonEmpty)
  }
}
