package graft.plans

import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-level scale guards, injected via `SparkSessionExtensions`
  * (`GraftExtensions` wires them with `injectOptimizerRule`).
  *
  * [[GuardCartesian]] is the production twin of the test-time PlanSpec
  * sweep: an unconditioned join that slips into a 100 TB pipeline is a
  * |L|×|R| explosion discovered hours into the run — this turns it into
  * an immediate, named failure at planning time. Opt-in per session:
  *
  *   spark.conf.set("spark.graft.failOnCartesian", "true")
  *
  * (default off: deliberate one-row scalar cross-joins — plan-literal
  * broadcasts like the stitching solve — are legitimate; sessions that
  * want the guard enable it and hint the exceptions via broadcast().)
  *
  * Wiring: build-time via the extensions class
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`), or on a
  * running session via
  * `spark.experimental.extraOptimizations :+= GuardCartesian(spark)`.
  */
case class GuardCartesian(session: org.apache.spark.sql.SparkSession)
  extends Rule[LogicalPlan] {

  private val FlagKey = "spark.graft.failOnCartesian"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(FlagKey, "false") == "true") {
      plan.foreach {
        case j @ Join(_, _, Cross | Inner, None, hint)
            if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
          throw new IllegalStateException(
            s"$FlagKey: unconditioned ${j.joinType} join (cartesian product) in plan — " +
              "add a join condition, broadcast() the scalar side, or disable the guard. " +
              s"Offending join:\n${j.treeString.take(2000)}")
        case _ => ()
      }
    }
    plan
  }
}
