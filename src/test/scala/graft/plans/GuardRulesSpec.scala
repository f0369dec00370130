package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GuardRulesSpec extends SparkSpec {

  test("GuardCartesian: unconditioned joins fail when enabled; hints/conditions/off pass") {
    val s = spark
    import s.implicits._
    val prev = s.experimental.extraOptimizations
    s.experimental.extraOptimizations = prev :+ GuardCartesian(s)
    try {
      val a = Seq(1L, 2L).toDF("x")
      val b = Seq(1L).toDF("y")

      s.conf.set("spark.graft.failOnCartesian", "true")
      val e = intercept[Exception](a.crossJoin(b).collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("failOnCartesian")), s"unexpected: $e")

      // a deliberate scalar broadcast is the sanctioned escape hatch
      assert(a.crossJoin(broadcast(b)).count() === 2)
      // conditioned joins are untouched
      assert(a.join(b, a("x") === b("y")).count() === 1)

      s.conf.set("spark.graft.failOnCartesian", "false")
      assert(a.crossJoin(b).count() === 2) // guard disabled → no-op
    } finally {
      s.experimental.extraOptimizations = prev
      s.conf.set("spark.graft.failOnCartesian", "false")
    }
  }
}
