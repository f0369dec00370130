package graft.stats

/** Dataset-stitching normalization math (reference:
  * columnflow/production/normalization.py:73-270 — branching ratios are
  * solved from the inclusive dataset's per-process weight sums, and each
  * leaf's effective denominator sums over every dataset covering it).
  *
  * Driver-side on purpose, like the reference: the inputs are per-process
  * scalars (one row per process after the stats aggregation), so the solve
  * is O(#processes) over a few dozen numbers; the result ships back into
  * the plan as a literal/broadcast lookup. The 100 TB part is the stats
  * aggregation that feeds it — a distributed decimal-exact groupBy.
  */
object Stitching {

  /** Process-DAG node; leaves are concrete phase-space slices. */
  final case class Proc(id: String, children: Seq[Proc] = Nil) {
    def leaves: Seq[Proc] =
      if (children.isEmpty) Seq(this) else children.flatMap(_.leaves)
  }

  /** Sum of weights of every leaf under `node` (exact decimal). */
  def sumw(node: Proc, leafSumw: Map[String, BigDecimal]): BigDecimal =
    if (node.children.isEmpty) leafSumw.getOrElse(node.id, BigDecimal(0))
    else node.children.map(sumw(_, leafSumw)).sum

  /** Branching ratio of each leaf relative to `root`, from the inclusive
    * dataset's per-leaf sums. The division happens in double — ratios are
    * physics parameters, not ledger values. */
  def branchingRatios(root: Proc, leafSumw: Map[String, BigDecimal]): Map[String, Double] = {
    val total = sumw(root, leafSumw).toDouble
    root.leaves.map(l => l.id -> sumw(l, leafSumw).toDouble / total).toMap
  }

  /** Per-leaf effective sum of weights: every dataset contributes its sums
    * for each leaf it covers (the stitching denominator). */
  def combinedSumw(datasets: Seq[Map[String, BigDecimal]]): Map[String, BigDecimal] =
    datasets.flatten.groupMapReduce(_._1)(_._2)(_ + _)

  /** Stitched normalization weight per leaf: xsec·br(leaf)/Σw_eff(leaf). */
  def stitchedNorm(root: Proc, xsec: Double,
                   inclusive: Map[String, BigDecimal],
                   datasets: Seq[Map[String, BigDecimal]]): Map[String, Double] = {
    val br = branchingRatios(root, inclusive)
    val eff = combinedSumw(datasets)
    br.map { case (leaf, b) => leaf -> xsec * b / eff(leaf).toDouble }
  }
}
