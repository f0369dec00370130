package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Scale demonstration for the skew-safe twins (round-9 VERDICT item #1):
  * a deliberately skewed corpus — one token ("the") present in EVERY
  * document — makes the hot token's WINDOW group hold |corpus| rows,
  * which WindowExec must buffer/sort in ONE task (a window group can
  * never be split), while the groupBy+join twin collapses the same key
  * map-side and the SALTED (token, salt) join key spreads the hot
  * token's probe rows saltFactor ways by construction. (The salting is
  * explicit because AQE's OptimizeSkewedJoin never fires here — it only
  * pattern-matches joins whose children are bare shuffle stages, and
  * the model's final aggregate sits between its exchange and the join;
  * an earlier unsalted build of this demo measured the hot partition
  * re-serializing at 24 s/task, worse than the window form.)
  *
  * Wall-clock on a shared 32-core box is noisy (everything contends for
  * the same disks), so the reported witness is MAX SINGLE-TASK TIME —
  * the direct measurement of serialization: at 1000 executors the
  * stage's wall clock IS its longest task. Usage:
  * runMain graft.WindowSkewDemo [nDocs]. Results → SCALE.md; the
  * value-identity pin is in RetrievalSpec, the plan shape in PlanSpec.
  */
object WindowSkewDemo {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 24000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maxTaskMs = new AtomicLong(0)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          maxTaskMs.getAndUpdate(m => math.max(m, t.taskInfo.duration))
          perStage.merge(t.stageId, t.taskInfo.duration,
            (a, b) => math.max(a, b))
        }
    })

    // every document carries "the" once; the rest of the vocabulary
    // spreads over ~50k tokens so non-hot groups stay small — the hot
    // group is the experiment
    val docs = spark.range(n).repartition(cpus.toInt)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("the"),
          concat(lit("w"), pmod(col("id"), lit(50021)))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count() // materialize the fixture outside the measured region

    def run(label: String)(f: => Long): Unit = {
      maxTaskMs.set(0)
      perStage.clear()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      // (listenerBus is spark-private — a short sleep is enough here)
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val stages = perStage.asScala.toSeq.sortBy(_._1)
        .map { case (s, ms) => f"s$s=${ms / 1000.0}%.1f" }.mkString(" ")
      println(f"[skew-demo] $label%-12s wall=$sec%7.2f s  maxTask=${maxTaskMs.get / 1000.0}%7.2f s  ($rows rows, n=$n)  [$stages]")
    }

    val target = pmod(col("doc_id"), lit(3)) === 0
    val train = pmod(col("doc_id"), lit(5)) =!= 0
    for (round <- 1 to 2) {
      run(s"window#$round") {
        graft.operators.Retrieval.naiveBayesLlr(docs, target, train).count()
      }
      run(s"skewSafe#$round") {
        graft.operators.Retrieval
          .naiveBayesLlr(docs, target, train, skewSafe = true).count()
      }
    }
    docs.unpersist()
    spark.stop()
  }
}
