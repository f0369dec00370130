package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A dotted path into a nested event schema, with optional per-event element
  * indexing — the Spark restatement of the reference's `Route`
  * (reference: columnflow/columnar_util.py:125-244).
  *
  * Examples:
  *   - `Route("Jet.pt")`        — the `pt` field of every jet (array<float>)
  *   - `Route("Jet.pt[0]")`     — leading-jet pt (scalar per event, null on
  *                                0-jet events; reference `Jet.pt[:,0]`)
  *   - `Route("Jet.pt[-1]")`    — trailing element, python-style
  *   - `Route("MET.pt")`        — scalar struct field
  *
  * The reference's `[:,k]` slice notation is accepted as an alias for `[k]`:
  * the leading `:` axis (events) is implicit in Spark's row model.
  */
final case class Route(steps: Vector[Route.Step]) {
  import Route._

  def fields: Vector[String] = steps.collect { case Field(n) => n }

  /** Dot-format name, e.g. `Jet.pt[0]`. */
  override def toString: String = {
    val sb = new StringBuilder
    steps.foreach {
      case Field(n) => if (sb.nonEmpty) sb += '.'; sb ++= n
      case Item(i)  => sb ++= s"[$i]"
    }
    sb.result()
  }

  /** Underscore ("nano") format, e.g. `Jet_pt`
    * (reference: columnflow/columnar_util.py:376-378). Index steps are
    * rendered positionally (`Jet_pt_0`). */
  def nanoColumn: String = steps.map {
    case Field(n) => n
    case Item(i)  => i.toString
  }.mkString("_")

  def /(field: String): Route = Route(steps :+ Field(field))
  def parent: Option[Route] =
    if (steps.size <= 1) None else Some(Route(steps.init))

  /** Compile to a Column against `df`'s schema. Missing intermediate fields
    * throw; a missing indexed element yields null (caller decides the
    * sentinel — see `columnOrElse`). */
  def column(df: DataFrame): Column = {
    var c: Column = null
    var t: DataType = df.schema
    steps.foreach {
      case Field(n) =>
        t match {
          case s: StructType =>
            val f = s.find(_.name == n).getOrElse(
              throw new IllegalArgumentException(
                s"route $this: no field '$n' in ${s.fieldNames.mkString(",")}"))
            c = if (c == null) df(quote(n)) else c.getField(n)
            t = f.dataType
          case ArrayType(s: StructType, _) =>
            val f = s.find(_.name == n).getOrElse(
              throw new IllegalArgumentException(
                s"route $this: no field '$n' in array element"))
            c = c.getField(n) // maps over the array
            t = ArrayType(f.dataType)
          case other =>
            throw new IllegalArgumentException(
              s"route $this: cannot descend into $other at '$n'")
        }
      case Item(i) =>
        t match {
          case ArrayType(el, _) =>
            // try_element_at is 1-based; negative counts from the end
            // (python semantics of the reference's slice routes); a missing
            // element yields null rather than an ANSI error — the
            // reference's null_value contract depends on this.
            c = try_element_at(c, lit(if (i >= 0) i + 1 else i))
            t = el
          case other =>
            throw new IllegalArgumentException(
              s"route $this: cannot index non-array $other")
        }
    }
    c
  }

  /** Column with the reference's `null_value` semantics: absent indexed
    * elements become `nullValue` instead of null
    * (reference: columnflow/tasks/histograms.py:309-312, EMPTY_FLOAT
    * sentinel columnflow/columnar_util.py:48-51). */
  def columnOrElse(df: DataFrame, nullValue: Column): Column =
    coalesce(column(df), nullValue)

  /** Does this route resolve against the schema?
    * (reference `has_ak_column`: columnflow/columnar_util.py:646-666) */
  def existsIn(schema: StructType): Boolean = {
    var t: DataType = schema
    steps.forall {
      case Field(n) =>
        t match {
          case s: StructType => s.find(_.name == n).exists { f => t = f.dataType; true }
          case ArrayType(s: StructType, _) =>
            s.find(_.name == n).exists { f => t = ArrayType(f.dataType); true }
          case _ => false
        }
      case Item(_) =>
        t match {
          case ArrayType(el, _) => t = el; true
          case _ => false
        }
    }
  }

  private def quote(n: String): String = n
}

object Route {
  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Item(index: Int) extends Step

  private val itemRe = """\[(?::\s*,\s*)?(-?\d+)\]""".r

  /** Parse dot format with optional `[k]` / `[:,k]` indexing. */
  def apply(path: String): Route = {
    require(path.nonEmpty, "empty route")
    val steps = Vector.newBuilder[Step]
    path.split('.').foreach { part =>
      val bracket = part.indexOf('[')
      val (name, idx) = if (bracket < 0) (part, "") else part.splitAt(bracket)
      if (name.nonEmpty) steps += Field(name)
      if (idx.nonEmpty) itemRe.findAllMatchIn(idx).foreach(m => steps += Item(m.group(1).toInt))
    }
    new Route(steps.result())
  }

  /** Brace expansion: `"Muon.{pt,eta}"` → `Seq(Muon.pt, Muon.eta)`
    * (reference shorthand: analysis_templates/.../selection/example.py:28).
    * Multiple brace groups expand as a cartesian product. */
  def expand(pattern: String): Seq[Route] = expandBraces(pattern).map(apply)

  def expandBraces(s: String): Seq[String] = {
    val open = s.indexOf('{')
    if (open < 0) Seq(s)
    else {
      val close = s.indexOf('}', open)
      require(close > open, s"unbalanced braces in '$s'")
      val (pre, rest) = (s.substring(0, open), s.substring(close + 1))
      s.substring(open + 1, close).split(',').toSeq.flatMap { alt =>
        expandBraces(pre + alt.trim + rest)
      }
    }
  }

  /** Glob match (`*`, `?`, `{a,b}`) against a route's dot-format name —
    * backs RouteFilter (reference: columnflow/columnar_util.py:1550-1623). */
  def globMatches(pattern: String, routeName: String): Boolean =
    expandBraces(pattern).exists { p =>
      val regex = p.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
        case c => c.toString
      }
      routeName.matches(regex)
    }
}
