package graft.export

/** Minimal combine-style datacard writer (reference DatacardWriter:
  * columnflow/inference/cms/datacard.py:35-1076 — write:228; empty-bin
  * handling :661). Driver-side by design: inputs are the already-merged
  * per-(category, process) yields, a few hundred numbers at most. The
  * engine's contribution is upstream — the bin tables those yields come
  * from; this renders them in the text format statistical tools consume.
  */
object Datacard {

  /** @param signals      processes with combine ids ≤ 0 (signal convention)
    * @param backgrounds  processes with ids ≥ 1
    * @param observations per-category observed counts
    * @param rates        per-(category, process) expected yields; absent
    *                     entries render as the empty-bin epsilon
    * @param systematics  (name, kind e.g. "lnN", per-(category, process)
    *                     effect; absent → "-")
    */
  final case class Spec(
      categories: Seq[String],
      signals: Seq[String],
      backgrounds: Seq[String],
      observations: Map[String, Double],
      rates: Map[(String, String), Double],
      systematics: Seq[(String, String, Map[(String, String), Double])] = Nil,
      emptyBinEpsilon: Double = 1e-5)

  def render(spec: Spec): String = {
    val procs = spec.signals ++ spec.backgrounds
    // combine ids: signals 0, -1, -2, …; backgrounds 1, 2, …
    val ids = spec.signals.zipWithIndex.map { case (p, i) => p -> -i } ++
      spec.backgrounds.zipWithIndex.map { case (p, i) => p -> (i + 1) }
    val cols = for (c <- spec.categories; p <- procs) yield (c, p)

    def rate(cp: (String, String)): String = {
      val r = spec.rates.getOrElse(cp, 0.0)
      fmt(if (r <= 0) spec.emptyBinEpsilon else r) // empty-bin fill
    }
    def fmt(d: Double): String =
      if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

    val sb = new StringBuilder
    sb ++= s"imax ${spec.categories.size}  number of categories\n"
    sb ++= s"jmax ${procs.size - 1}  number of processes minus 1\n"
    sb ++= s"kmax ${spec.systematics.size}  number of nuisance parameters\n"
    sb ++= "----------\n"
    sb ++= row("bin" +: spec.categories)
    sb ++= row("observation" +: spec.categories.map(c => fmt(spec.observations.getOrElse(c, 0.0))))
    sb ++= "----------\n"
    sb ++= row("bin" +: cols.map(_._1))
    sb ++= row("process" +: cols.map(_._2))
    sb ++= row("process" +: cols.map(cp => ids.toMap.apply(cp._2).toString))
    sb ++= row("rate" +: cols.map(rate))
    if (spec.systematics.nonEmpty) sb ++= "----------\n"
    spec.systematics.foreach { case (name, kind, effects) =>
      sb ++= row(name +: kind +: cols.map(cp => effects.get(cp).map(fmt).getOrElse("-")))
    }
    sb.result()
  }

  private def row(cells: Seq[String]): String = {
    val widths = cells.map(c => math.max(c.length + 2, 12))
    cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString.stripTrailing + "\n"
  }
}
