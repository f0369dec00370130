package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structural column operations over nested event schemas — the Spark
  * restatement of the reference's column-mutation API (SURVEY §1.3;
  * reference: columnflow/columnar_util.py:593-1188).
  *
  * All operations are plan transformations (`withColumn`/`withField`/
  * `dropFields`/`transform`), so Catalyst sees through them: nested-schema
  * pruning and predicate pushdown still reach the parquet scan.
  */
object SchemaOps {

  /** All leaf routes of a schema, depth-first in field order
    * (reference `get_ak_routes`: columnflow/columnar_util.py:593-643).
    * Arrays of structs descend into the element struct; arrays of
    * primitives are leaves. */
  def routes(schema: StructType): Seq[Route] = {
    def walk(prefix: Vector[Route.Step], t: DataType): Seq[Route] = t match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(prefix :+ Route.Field(f.name), f.dataType))
      case ArrayType(s: StructType, _) =>
        s.fields.toSeq.flatMap(f => walk(prefix :+ Route.Field(f.name), f.dataType))
      case _ => Seq(Route(prefix))
    }
    walk(Vector.empty, schema)
  }

  def hasRoute(df: DataFrame, route: Route): Boolean = route.existsIn(df.schema)

  /** Add or overwrite a column at a nested route, auto-creating parents
    * (reference `set_ak_column`: columnflow/columnar_util.py:669-756).
    *
    * Top-level routes use `withColumn`. A route into a struct uses
    * `withField`. A route into an array-of-structs wraps the value in a
    * `transform` — `value` must then be an expression over the lambda
    * element, built via the `withRouteInArray` overload.
    */
  def withRoute(df: DataFrame, route: Route, value: Column): DataFrame = {
    route.steps match {
      case Vector(Route.Field(n)) => df.withColumn(n, value)
      case Route.Field(top) +: rest if rest.forall(_.isInstanceOf[Route.Field]) =>
        val innerPath = rest.collect { case Route.Field(n) => n }.mkString(".")
        df.schema.find(_.name == top).map(_.dataType) match {
          case Some(_: StructType) | None =>
            val base =
              if (df.schema.fieldNames.contains(top)) df(top)
              else struct() // auto-create parent struct
            df.withColumn(top, base.withField(innerPath, value))
          case Some(ArrayType(_: StructType, _)) =>
            throw new IllegalArgumentException(
              s"route $route targets an array element; use mapCollection")
          case Some(other) =>
            throw new IllegalArgumentException(s"cannot set $route into $other")
        }
      case _ =>
        throw new IllegalArgumentException(s"cannot set indexed route $route")
    }
  }

  /** Add/overwrite fields of every element of a collection (array<struct>):
    * `mapCollection(df, "Jet", jet => Map("pt_up" -> jet.getField("pt")*1.05))`.
    * This is how calibrators emit shifted columns per object
    * (reference: columnflow/calibration/cms/jets.py:436-445). */
  def mapCollection(df: DataFrame, name: String, build: Column => Map[String, Column]): DataFrame =
    df.withColumn(name, transform(df(name), el =>
      build(el).foldLeft(el) { case (acc, (f, v)) => acc.withField(f, v) }))

  /** Remove a leaf route, pruning parents that become empty
    * (reference `remove_ak_column`: columnflow/columnar_util.py:759-800). */
  def removeRoute(df: DataFrame, route: Route): DataFrame = {
    val names = route.fields
    names match {
      case Vector(n) => df.drop(n)
      case top +: rest =>
        df.schema.find(_.name == top).map(_.dataType) match {
          case Some(s: StructType) =>
            if (s.fields.length == 1 && rest.size == 1) df.drop(top)
            else df.withColumn(top, df(top).dropFields(rest.mkString(".")))
          case Some(ArrayType(s: StructType, _)) =>
            if (s.fields.length == 1 && rest.size == 1) df.drop(top)
            else df.withColumn(top,
              transform(df(top), el => el.dropFields(rest.mkString("."))))
          case _ => df.drop(names.mkString("."))
        }
    }
  }

  /** Missing-route strategies for aliases
    * (reference `add_ak_aliases`: columnflow/columnar_util.py:803-903). */
  sealed trait Missing
  object Missing {
    case object Error extends Missing
    case object Ignore extends Missing
  }

  /** Copy `src` to `dst` (both routes), optionally removing the source —
    * the shift-alias primitive (reference column_aliases application:
    * columnflow/tasks/selection.py:212-217). */
  def withAlias(df: DataFrame, src: Route, dst: Route,
                removeSrc: Boolean = false,
                missing: Missing = Missing.Error): DataFrame = {
    if (!hasRoute(df, src)) missing match {
      case Missing.Error  => throw new IllegalArgumentException(s"alias source $src missing")
      case Missing.Ignore => return df
    }
    val withDst = (src.steps, dst.steps) match {
      // same collection: Jet.pt_jec_up -> Jet.pt stays inside the transform
      case (Route.Field(a) +: Vector(Route.Field(sf)), Route.Field(b) +: Vector(Route.Field(df_))) if a == b =>
        df.schema.find(_.name == a).map(_.dataType) match {
          case Some(ArrayType(_: StructType, _)) =>
            mapCollection(df, a, el => Map(df_ -> el.getField(sf)))
          case _ => withRoute(df, dst, src.column(df))
        }
      case _ => withRoute(df, dst, src.column(df))
    }
    if (removeSrc && src != dst) removeRoute(withDst, src) else withDst
  }

  /** Flatten a nested schema into nano-style flat columns
    * (reference `flatten_ak_array`: columnflow/columnar_util.py:993-1024):
    * `Jet.pt` (array<struct> field) becomes column `Jet_pt: array<float>`. */
  def flatten(df: DataFrame, sep: String = "_"): DataFrame = {
    val cols = routes(df.schema).map { r =>
      r.column(df).as(r.fields.mkString(sep))
    }
    df.select(cols: _*)
  }

  /** Canonical (sorted) field order, recursively — deterministic output
    * schemas (reference `sort_ak_fields`: columnflow/columnar_util.py:1027-1058). */
  def sortFields(df: DataFrame): DataFrame = {
    def sortCol(c: Column, t: DataType): Column = t match {
      case s: StructType =>
        struct(s.fields.sortBy(_.name).map(f =>
          sortCol(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(s: StructType, _) =>
        transform(c, el => struct(s.fields.sortBy(_.name).map(f =>
          sortCol(el.getField(f.name), f.dataType).as(f.name)): _*))
      case _ => c
    }
    val sorted = df.schema.fields.sortBy(_.name)
    df.select(sorted.map(f => sortCol(df(f.name), f.dataType).as(f.name)): _*)
  }

  /** Keep/remove leaf routes by glob patterns — the write-side projection
    * (reference `RouteFilter`: columnflow/columnar_util.py:1550-1623;
    * keep_columns resolution: columnflow/reduction/default.py:32-37).
    * Keep wins are evaluated first; remove patterns then subtract. */
  def routeFilter(df: DataFrame, keep: Seq[String], remove: Seq[String] = Nil): DataFrame = {
    val all = routes(df.schema)
    val kept = all.filter { r =>
      val name = r.toString
      (keep.isEmpty || keep.exists(p => Route.globMatches(p, name))) &&
        !remove.exists(p => Route.globMatches(p, name))
    }
    selectRoutes(df, kept)
  }

  /** Rebuild a DataFrame containing exactly the given leaf routes, keeping
    * the nested structure at every depth (recurses per level, so `a.b.c`
    * stays a struct-in-struct rather than flattening to a field `c`). */
  def selectRoutes(df: DataFrame, rs: Seq[Route]): DataFrame = {
    val byTop = rs.groupBy(_.fields.head)
    val order = df.schema.fieldNames.filter(byTop.contains)
    val cols = order.map { top =>
      rebuild(df(top), df.schema(top).dataType, byTop(top).map(_.fields.tail)).as(top)
    }
    df.select(cols: _*)
  }

  /** Prune a column to the sub-leaves addressed by `suffixes` (path
    * segments below this node). An empty suffix means the whole subtree
    * is kept verbatim. */
  private def rebuild(c: Column, dt: DataType, suffixes: Seq[Seq[String]]): Column =
    if (suffixes.exists(_.isEmpty)) c
    else dt match {
      case s: StructType =>
        val byHead = suffixes.groupBy(_.head)
        val order = s.fieldNames.filter(byHead.contains)
        struct(order.map { f =>
          rebuild(c.getField(f), s(f).dataType, byHead(f).map(_.tail)).as(f)
        }.toSeq: _*)
      case ArrayType(el: DataType, _) =>
        // routes address the element type; rebuild applies per element
        transform(c, e => rebuild(e, el, suffixes))
      case _ => c
    }
}
