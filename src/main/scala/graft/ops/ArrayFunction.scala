package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Route, SchemaOps}

/** The operator extension surface — Spark restatement of the reference's
  * six operator classes (SURVEY §2.0; reference ArrayFunction:
  * columnflow/columnar_util.py:1625-2447).
  *
  * An ArrayFunction is a composable column kernel declaring its read set
  * (`uses`) and write set (`produces`) as routes or nested operator
  * references; the framework resolves these transitively into the exact
  * leaf-column read/write sets (reference used_columns/produced_columns:
  * columnflow/columnar_util.py:1790-1802), prunes the scan to the read set,
  * and validates both sets at call time (reference check_used_columns:
  * columnflow/columnar_util.py:1833-1834).
  */
trait ArrayFunction {
  def name: String

  /** Routes read, or other ArrayFunctions whose read set is inherited. */
  def uses: Set[Dep] = Set.empty

  /** Routes written, or other ArrayFunctions whose write set is inherited. */
  def produces: Set[Dep] = Set.empty

  /** Transitive leaf read set (required routes only). */
  final def usedRoutes: Set[Route] = usedRoutes(DatasetCtx.default)
  final def usedRoutes(ctx: DatasetCtx): Set[Route] =
    resolve(_.uses, Set(this.name), ctx, optional = false)
  final def producedRoutes: Set[Route] = producedRoutes(DatasetCtx.default)
  final def producedRoutes(ctx: DatasetCtx): Set[Route] =
    resolve(_.produces, Set(this.name), ctx, optional = false)

  /** Optional read routes (reference optional_column:
    * columnflow/columnar_util.py:2503): read when present, never required. */
  final def optionalRoutes(ctx: DatasetCtx = DatasetCtx.default): Set[Route] =
    resolve(_.uses, Set(this.name), ctx, optional = true)

  /** The scan projection for a frame: required ∪ (optional ∩ present) —
    * the reference's read-set computation (columnflow/tasks/selection.py
    * :171-176). */
  final def readSet(df: DataFrame, ctx: DatasetCtx = DatasetCtx.default): Set[Route] =
    usedRoutes(ctx) ++ optionalRoutes(ctx).filter(_.existsIn(df.schema))

  private def resolve(sel: ArrayFunction => Set[Dep], seen: Set[String],
                      ctx: DatasetCtx, optional: Boolean): Set[Route] =
    sel(this).flatMap(resolveDep(_, sel, seen, ctx, optional))

  private def resolveDep(d: Dep, sel: ArrayFunction => Set[Dep], seen: Set[String],
                         ctx: DatasetCtx, optional: Boolean): Set[Route] = d match {
    case Dep.R(r)   => if (optional) Set.empty else Set(r)
    case Dep.Opt(r) => if (optional) Set(r) else Set.empty
    case Dep.If(cond, inner) =>
      if (cond(ctx)) resolveDep(inner, sel, seen, ctx, optional) else Set.empty
    case Dep.F(f) =>
      require(!seen(f.name), s"cyclic operator dependency at ${f.name}")
      f.resolve(sel, seen + f.name, ctx, optional)
  }

  /** Runtime schema validation, mirroring the reference's call-time checks
    * (optional routes are exempt, like the reference's tagged columns). */
  protected def checkUses(df: DataFrame, ctx: DatasetCtx = DatasetCtx.default): Unit = {
    val missing = usedRoutes(ctx).filterNot(_.existsIn(df.schema))
    require(missing.isEmpty, s"$name: missing input routes ${missing.mkString(", ")}")
  }
  protected def checkProduces(df: DataFrame, ctx: DatasetCtx = DatasetCtx.default): Unit = {
    val missing = producedRoutes(ctx).filterNot(_.existsIn(df.schema))
    require(missing.isEmpty, s"$name: did not produce ${missing.mkString(", ")}")
  }
}

/** Dataset context for conditional column sets (reference IF_MC/IF_DATA/
  * IF_DATASET_HAS_TAG: columnflow/columnar_util.py:2448-2462): the same
  * operator reads different columns on data vs simulation vs tagged
  * datasets — resolved before the plan is built, so each variant's scan
  * reads only its own set. */
final case class DatasetCtx(isMc: Boolean = true, tags: Set[String] = Set.empty)
object DatasetCtx { val default: DatasetCtx = DatasetCtx() }

/** A dependency: a concrete route (required or optional), a conditional
  * wrapper, or a nested operator. */
sealed trait Dep
object Dep {
  final case class R(route: Route) extends Dep
  final case class Opt(route: Route) extends Dep
  final case class If(cond: DatasetCtx => Boolean, dep: Dep) extends Dep
  final case class F(fn: ArrayFunction) extends Dep

  /** Tag shorthands mirroring the reference decorators. */
  def optional(r: String): Dep = Opt(Route(r))
  def ifMc(d: Dep): Dep = If(_.isMc, d)
  def ifData(d: Dep): Dep = If(!_.isMc, d)
  def ifTag(tag: String)(d: Dep): Dep = If(_.tags(tag), d)

  import scala.language.implicitConversions
  implicit def fromString(s: String): Dep = R(Route(s))
  implicit def fromRoute(r: Route): Dep = R(r)
  implicit def fromFn(f: ArrayFunction): Dep = F(f)
}

/** Mutates existing columns (energy corrections …) — emits the full frame
  * with corrected columns; `diff` projects just the produced columns for
  * checkpointing (reference Calibrator: columnflow/calibration/__init__.py). */
trait Calibrator extends ArrayFunction {
  def apply(df: DataFrame): DataFrame
  final def applyChecked(df: DataFrame): DataFrame = {
    checkUses(df); val out = apply(df); checkProduces(out); out
  }
}

/** Event/object masks without row deletion (reference Selector +
  * SelectionResult: columnflow/selection/__init__.py:22-344). */
trait Selector extends ArrayFunction {
  def select(df: DataFrame): SelectionResult
}

/** The selection verdict: named step masks (event-level booleans), object
  * index masks per (source collection → destination collection), and
  * auxiliary columns. `event` is the AND-fold of steps
  * (reference create_event_mask: columnflow/reduction/util.py:26-52). */
final case class SelectionResult(
    steps: Map[String, Column] = Map.empty,
    objects: Map[String, Map[String, Column]] = Map.empty,
    aux: Map[String, Column] = Map.empty) {

  def eventMask: Column =
    steps.values.reduceOption(_ && _).getOrElse(lit(true))

  /** Merge two results (reference SelectionResult.__add__:
    * columnflow/selection/__init__.py:229-280). Step names must not clash. */
  def +(other: SelectionResult): SelectionResult = {
    val clash = steps.keySet.intersect(other.steps.keySet)
    require(clash.isEmpty, s"duplicate selection steps: $clash")
    SelectionResult(
      steps ++ other.steps,
      objects ++ other.objects.map { case (k, v) => k -> (objects.getOrElse(k, Map.empty) ++ v) },
      aux ++ other.aux)
  }

  /** Materialize as columns on the frame — the `to_ak` analogue
    * (reference: columnflow/selection/__init__.py:303-344): adds
    * `event: boolean`, `steps: struct<...>`, `objects: struct<src: struct<dst: array<int>>>`. */
  def columns: Seq[Column] = {
    val stepCols =
      if (steps.isEmpty) Nil
      else Seq(struct(steps.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }: _*).as("steps"))
    val objCols =
      if (objects.isEmpty) Nil
      else Seq(struct(objects.toSeq.sortBy(_._1).map { case (src, dsts) =>
        struct(dsts.toSeq.sortBy(_._1).map { case (d, c) => c.as(d) }: _*).as(src)
      }: _*).as("objects"))
    Seq(eventMask.as("event")) ++ stepCols ++ objCols ++
      aux.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
  }
}

/** Applies masks: drops rows, projects collections, prunes columns
  * (reference Reducer: columnflow/reduction/__init__.py:16-121; default
  * impl columnflow/reduction/default.py:23-104). */
trait Reducer extends ArrayFunction {
  def reduce(df: DataFrame, result: SelectionResult): DataFrame
}

/** Derives new columns, emitting the enriched frame
  * (reference Producer: columnflow/production/__init__.py). */
trait Producer extends ArrayFunction {
  def apply(df: DataFrame): DataFrame
  final def applyChecked(df: DataFrame): DataFrame = {
    checkUses(df); val out = apply(df); checkProduces(out); out
  }
}

/** A named boolean event mask (reference Categorizer:
  * columnflow/categorization/__init__.py:16-62). */
trait Categorizer extends ArrayFunction {
  def id: Long
  def mask(df: DataFrame): Column
}

object Reducers {
  /** The default reducer (reference cf_default:
    * columnflow/reduction/default.py:23-104): apply the event mask, then
    * project each collection through its index mask, building destination
    * collections (e.g. BJet from Jet) via the per-event index arrays
    * (reference create_collections_from_masks:
    * columnflow/reduction/util.py:55-107). */
  def default(df: DataFrame, result: SelectionResult): DataFrame = {
    val masked = df.filter(result.eventMask)
    result.objects.foldLeft(masked) { case (acc, (src, dsts)) =>
      dsts.foldLeft(acc) { case (a, (dst, indices)) =>
        a.withColumn(dst, transform(indices, i => element_at(a(src), i + 1)))
      }
    }
  }
}
