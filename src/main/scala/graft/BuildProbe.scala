package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level wall attribution for the kNN-graph index build — the
  * measurement tool behind the rule-31a cost-model work ("measure
  * first" is the build-optimization discipline; a 1251 s wall at the
  * 512k rung is a sum of stages, and guessing which one dominates has
  * been wrong before — the 64x Generate re-evaluation of rule 15 hid
  * in exactly this kind of total).
  *
  * Runs ensureIvfIndex (timed separately — quantizer cost is NOT
  * build cost), then drops and rebuilds the graph index with a
  * listener attached, and prints one line per stage: wall, summed
  * task time, tasks, input bytes, shuffle read/write, spill, and the
  * stage's call site. Plus one JSON summary line.
  *
  * Usage: runMain graft.BuildProbe <corpusDir> [k]
  */
object BuildProbe {
  private class Agg {
    var name = ""
    var wallMs = 0L
    var taskMs = 0L
    var tasks = 0
    var input = 0L
    var sr = 0L
    var sw = 0L
    var spill = 0L
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BuildProbe <corpusDir> [k]")
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)

    val t0 = System.nanoTime()
    operators.Similarity.ensureIvfIndex(spark, dir)
    val ivfWall = (System.nanoTime() - t0) / 1e9

    val stages =
      new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    def agg(id: Int) = stages.computeIfAbsent(id, _ => new Agg)
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val a = agg(e.stageInfo.stageId)
        a.name = e.stageInfo.name.linesIterator.next()
        a.wallMs = (for {
          s <- e.stageInfo.submissionTime
          c <- e.stageInfo.completionTime
        } yield c - s).getOrElse(0L)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = agg(e.stageId)
          a.synchronized {
            a.taskMs += m.executorRunTime
            a.tasks += 1
            a.input += m.inputMetrics.bytesRead
            a.sr += m.shuffleReadMetrics.totalBytesRead
            a.sw += m.shuffleWriteMetrics.bytesWritten
            a.spill += m.diskBytesSpilled
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t1 = System.nanoTime()
    operators.Similarity.dropKnnGraphIndex(spark, dir, k)
    operators.Similarity.ensureKnnGraphIndex(spark, dir, k)
    val buildWall = (System.nanoTime() - t1) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    val (chunks, rows, wall) = operators.Similarity.LastGraphBuild
    def mb(b: Long) = math.rint(b / 1e5) / 10
    import scala.jdk.CollectionConverters._
    val rows2 = stages.asScala.toSeq.sortBy(-_._2.wallMs)
    println(f"${"stage"}%6s ${"wall_s"}%8s ${"task_s"}%8s " +
      f"${"tasks"}%6s ${"in_MB"}%9s ${"sRd_MB"}%9s ${"sWr_MB"}%9s " +
      f"${"spill_MB"}%9s  site")
    rows2.take(30).foreach { case (id, a) =>
      println(f"$id%6d ${a.wallMs / 1e3}%8.1f ${a.taskMs / 1e3}%8.1f " +
        f"${a.tasks}%6d ${mb(a.input)}%9.1f ${mb(a.sr)}%9.1f " +
        f"${mb(a.sw)}%9.1f ${mb(a.spill)}%9.1f  ${a.name.take(90)}")
    }
    val totTask = rows2.map(_._2.taskMs).sum / 1e3
    println(s"""{"metric":"build_probe","dir":"$dir","k":$k,""" +
      s""""ivf_ensure_wall_s":${math.rint(ivfWall * 10) / 10},""" +
      s""""build_wall_s":${math.rint(buildWall * 10) / 10},""" +
      s""""chunks":$chunks,"rows":$rows,""" +
      s""""last_build_wall_s":${math.rint(wall * 10) / 10},""" +
      s""""stages":${rows2.size},""" +
      s""""sum_task_s":${math.rint(totTask * 10) / 10}}""")
  }
}
