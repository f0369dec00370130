package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement tool (guide §1): run one or more registry queries with the
  * bench session settings and print a per-stage breakdown — wall clock per
  * run, and per stage the task-time sum, shuffle read/write bytes, spill,
  * task count and max/median task skew. This is the programmatic stand-in
  * for the Spark UI stage page (the sandbox runs with spark.ui.enabled
  * false).
  *
  * Usage: runMain graft.Profile <sfDir> <nRuns> <query,query,...>
  * Never part of the driver contract; purely a local optimization aid.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args(2).split(",").filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(id: Int, name: String, ms: Long, taskMs: Long,
        tasks: Int, shufR: Long, shufW: Long, input: Long, spill: Long,
        maxTaskMs: Long)
    val stages = mutable.ArrayBuffer[StageRow]()
    // per-stage max task run time, fed by onTaskEnd (the stage-page
    // max/median skew column; StageInfo itself only carries sums)
    val maxTask = mutable.Map[Int, Long]()
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) maxTask.synchronized {
          val cur = maxTask.getOrElse(te.stageId, 0L)
          maxTask(te.stageId) = math.max(cur, te.taskMetrics.executorRunTime)
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b
        stages.synchronized {
          stages += StageRow(si.stageId,
            si.name.split("\n").head.take(60),
            wall.getOrElse(-1L),
            m.executorRunTime, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.bytesRead,
            m.memoryBytesSpilled + m.diskBytesSpilled,
            maxTask.synchronized(maxTask.getOrElse(si.stageId, -1L)))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.queries.Registry.queries(name)
      // untimed warmup (codegen + JIT), same as Bench
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val walls = (1 to runs).map { i =>
        stages.synchronized(stages.clear())
        maxTask.synchronized(maxTask.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      // stages of the LAST run only (cleared per run); listener events are
      // async — drain the bus so tail stages are never dropped (the old
      // fixed sleep was a race)
      org.apache.spark.sql.graftbridge.ColumnBridge
        .waitListenerBusEmpty(spark.sparkContext)
      println(s"##### $name walls=${walls.map(w => f"$w%.3f").mkString(",")}")
      val rows = stages.synchronized(stages.toVector).sortBy(_.id)
      val totTask = rows.map(_.taskMs).sum
      println(f"  stages=${rows.size} taskTimeSum=${totTask}ms")
      rows.foreach { r =>
        println(f"  stage ${r.id}%4d wall=${r.ms}%5dms task=${r.taskMs}%6dms n=${r.tasks}%3d " +
          f"maxTask=${r.maxTaskMs}%6dms in=${r.input / 1024}%7dK sr=${r.shufR / 1024}%6dK " +
          f"sw=${r.shufW / 1024}%6dK spill=${r.spill / 1024}%5dK  ${r.name}%s")
      }
    }
    spark.stop()
  }
}
