package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.hist.Axis
import graft.ops.DatasetCtx
import graft.pipeline.Shift
import graft.stats.Stitching

/** The analysis-config model — the reference's `order` layer (SURVEY §7.1
  * `registry/`; reference vendored modules/order: Dataset/Process/Category/
  * Variable objects wired into every task via mixins,
  * columnflow/tasks/framework/mixins.py:64-2586).
  *
  * Everything here is driver-side metadata: DAGs are walked in Scala,
  * selections compile to `Column` expressions, and ids/lookup tables enter
  * plans as literals. Nothing in this file touches data.
  */

/** A process-DAG node (physics process with cross-section); leaves are the
  * concrete phase-space slices datasets are generated in. */
final case class Process(id: Long, name: String, xsec: Double = 0.0,
                         children: Seq[Process] = Nil) {
  def leaves: Seq[Process] = if (children.isEmpty) Seq(this) else children.flatMap(_.leaves)
  def find(n: String): Option[Process] =
    if (name == n) Some(this) else children.flatMap(_.find(n)).headOption
  /** Bridge to the stitching solve (`stats/Stitching`). */
  def stitchingTree: Stitching.Proc =
    Stitching.Proc(name, children.map(_.stitchingTree))
}

/** A category-DAG node: named boolean selection, hierarchical ids
  * (reference category trees consumed by select_category_bins). */
final case class Category(id: Long, name: String, selection: String = "true",
                          children: Seq[Category] = Nil) {
  def leaves: Seq[Category] = if (children.isEmpty) Seq(this) else children.flatMap(_.leaves)
  /** The id DAG in the shape `HistTable.selectCategories` consumes. */
  def dag: Map[Long, Seq[Long]] =
    (if (children.isEmpty) Map.empty[Long, Seq[Long]]
     else Map(id -> children.map(_.id))) ++ children.flatMap(_.dag)
  /** Event mask for this category: own selection AND parent chain is the
    * caller's concern; leaf selections are self-contained here. */
  def mask: Column = expr(selection)
}

/** A variable: expression + binning + null fallback (reference od.Variable
  * with null_value, applied at columnflow/tasks/histograms.py:304-314). */
final case class Variable(name: String, expression: String, axis: Axis,
                          nullValue: Option[Double] = None) {
  def column: Column = {
    val e = expr(expression)
    nullValue.map(nv => coalesce(e, lit(nv))).getOrElse(e)
  }
  def binId: Column = axis.binId(column)
}

/** A dataset: files + data/MC nature + tags + the leaf processes it
  * covers (reference od.Dataset + GetDatasetLFNs,
  * columnflow/tasks/external.py:31-396). */
final case class Dataset(name: String, files: Seq[String], isMc: Boolean = true,
                         tags: Set[String] = Set.empty,
                         processes: Seq[Long] = Nil) {
  /** Context for conditional column resolution (`ops/DatasetCtx`). */
  def ctx: DatasetCtx = DatasetCtx(isMc, tags)
  def load(spark: SparkSession): DataFrame = spark.read.parquet(files: _*)
}

/** The assembled config: what the reference's CLI mixins resolve operator
  * instances against. */
final case class AnalysisConfig(
    datasets: Seq[Dataset],
    processRoot: Process,
    categoryRoot: Category,
    variables: Seq[Variable],
    shifts: Seq[Shift] = Seq(Shift.Nominal)) {

  def dataset(n: String): Dataset =
    datasets.find(_.name == n).getOrElse(sys.error(s"unknown dataset $n"))
  def variable(n: String): Variable =
    variables.find(_.name == n).getOrElse(sys.error(s"unknown variable $n"))
  def shift(n: String): Shift =
    shifts.find(_.name == n).getOrElse(sys.error(s"unknown shift $n"))

  def leafCategories: Seq[Category] = categoryRoot.leaves
  def categoryDag: Map[Long, Seq[Long]] = categoryRoot.dag

  /** The category_ids producer from the config: the ragged id list of all
    * matching leaf categories (reference columnflow/production/categories
    * .py:31-105 — evaluated over leaves, AND within each). */
  def categoryIds: Column =
    array_compact(array(leafCategories.map(c =>
      when(c.mask, lit(c.id)).otherwise(lit(null))): _*))

  /** Per-leaf-process ids as a broadcastable literal, for process_ids. */
  def processIdOf(leafName: String): Long =
    processRoot.find(leafName).map(_.id).getOrElse(sys.error(s"unknown process $leafName"))
}
