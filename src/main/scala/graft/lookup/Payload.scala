package graft.lookup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.hist.Axis

/** Correction-payload loader: parses a correctionlib-style JSON document
  * (schema v2 node shapes — reference consumption chain `get_evaluators`/
  * `ak_evaluate`: columnflow/calibration/cms/jets.py:40-142) and compiles
  * each correction into the same plan-literal Column expressions the
  * hand-built lookups use ([[BinnedTable.Lookup1D]]/[[BinnedTable.Lookup2D]]/
  * [[BinnedTable.Interp1D]]). This is the path from a payload FILE to a
  * lookup: corrections ship inside the serialized plan, no join, no
  * broadcast-variable lifecycle.
  *
  * Supported node types:
  *  - scalar (bare JSON number)
  *  - `category`: string or integer keys, optional `default`
  *  - `binning`: ascending edges, scalar or nested-node content
  *  - `multibinning`: N-dimensional edges with a flat row-major scalar grid
  *  - `linear` (extension node, `{nodetype, input, xs, ys}`): piecewise-
  *    linear interpolation with edge clamping — correctionlib expresses
  *    these as Formula strings; declaring the knots directly keeps the
  *    payload engine-neutral.
  *
  * Flow semantics for out-of-range inputs: `"clamp"` clamps into the edge
  * bins (the reference payloads' standard), a JSON number is a constant
  * fill, and `"error"` maps to NULL — a distributed expression cannot
  * raise per row; NULL composes with filters and is loud under
  * aggregation. Bin membership follows the library's axis convention
  * (last-edge-inclusive, hist/Axis.scala) so payload lookups agree with
  * the histogram binning of the same quantity.
  */
object Payload {

  sealed trait Flow
  object Flow {
    case object Clamp extends Flow
    case object Null extends Flow
    final case class Const(v: Double) extends Flow
  }

  sealed trait Node
  final case class Scalar(v: Double) extends Node
  final case class Linear(input: String, xs: IndexedSeq[Double], ys: IndexedSeq[Double]) extends Node
  final case class Binning(input: String, edges: IndexedSeq[Double],
                           content: IndexedSeq[Node], flow: Flow) extends Node
  final case class MultiBinning(inputs: IndexedSeq[String], edges: IndexedSeq[IndexedSeq[Double]],
                                values: IndexedSeq[Double], flow: Flow) extends Node
  /** Category keys are stored as strings; `intKeys` records whether the
    * payload declared integer keys (comparison casts accordingly). */
  final case class Category(input: String, keys: IndexedSeq[(String, Node)],
                            intKeys: Boolean, default: Option[Node]) extends Node

  final case class Input(name: String, typ: String)

  /** One named correction: an input declaration list and a node tree.
    * `apply` compiles the tree over named input columns; `sql` renders the
    * DuckDB mirror over named input expressions (for oracle queries). */
  final case class Correction(name: String, version: Int,
                              inputs: IndexedSeq[Input], data: Node) {

    def apply(args: (String, Column)*): Column = {
      val m = args.toMap
      val missing = inputNames.filterNot(m.contains)
      require(missing.isEmpty, s"correction '$name' missing inputs: ${missing.mkString(", ")}")
      evalNode(data, m)
    }

    /** Positional form following the payload's input declaration order. */
    def applyPositional(cols: Column*): Column = {
      require(cols.size == inputs.size,
        s"correction '$name' takes ${inputs.size} inputs, got ${cols.size}")
      apply(inputs.map(_.name).zip(cols): _*)
    }

    def sql(args: (String, String)*): String = {
      val m = args.toMap
      val missing = inputNames.filterNot(m.contains)
      require(missing.isEmpty, s"correction '$name' missing inputs: ${missing.mkString(", ")}")
      sqlNode(data, m)
    }

    private def inputNames: Seq[String] = collectInputs(data).distinct
    private def collectInputs(n: Node): Seq[String] = n match {
      case Scalar(_) => Nil
      case Linear(i, _, _) => Seq(i)
      case Binning(i, _, c, _) => i +: c.flatMap(collectInputs)
      case MultiBinning(is, _, _, _) => is
      case Category(i, ks, _, d) => i +: (ks.map(_._2) ++ d.toSeq).flatMap(collectInputs)
    }
  }

  final case class CorrectionSet(schemaVersion: Int, corrections: Map[String, Correction]) {
    def apply(name: String): Correction = corrections.getOrElse(name,
      throw new NoSuchElementException(
        s"correction '$name' not found; available: ${corrections.keys.toSeq.sorted.mkString(", ")}"))
  }

  // --- compilation -------------------------------------------------------

  private def axisOf(edges: IndexedSeq[Double]): Axis = Axis.Variable("x", edges)

  /** In-range bin id with flow applied: Some(column) = usable id, plus an
    * optional out-of-range condition for non-clamp flows. */
  private def binWithFlow(v: Column, edges: IndexedSeq[Double], flow: Flow): (Column, Option[Column]) = {
    val ax = axisOf(edges)
    val id = ax.binId(v)
    val clamped = least(greatest(id, lit(0)), lit(ax.nBins - 1))
    flow match {
      case Flow.Clamp => (clamped, None)
      case _ => (clamped, Some(id < 0 || id >= ax.nBins))
    }
  }

  private def flowValue(flow: Flow): Column = flow match {
    case Flow.Const(v) => lit(v)
    case _ => lit(null).cast("double")
  }

  private def evalNode(n: Node, args: Map[String, Column]): Column = n match {
    case Scalar(v) => lit(v)
    case Linear(in, xs, ys) => BinnedTable.Interp1D(xs, ys)(args(in))
    case Binning(in, edges, content, flow) =>
      val v = args(in)
      val (id, oor) = binWithFlow(v, edges, flow)
      val body =
        if (content.forall(_.isInstanceOf[Scalar]))
          // scalar grid → single element_at, same shape as Lookup1D
          element_at(array(content.map(c => lit(c.asInstanceOf[Scalar].v)): _*), id + 1)
        else // nested nodes → bin-id dispatch
          content.zipWithIndex.tail.foldLeft(evalNode(content.head, args)) {
            case (acc, (node, i)) => when(id === i, evalNode(node, args)).otherwise(acc)
          }
      oor.fold(body)(c => when(c, flowValue(flow)).otherwise(body))
    case MultiBinning(ins, edges, values, flow) =>
      val ids = ins.zip(edges).map { case (in, e) => binWithFlow(args(in), e, flow) }
      // row-major flattened index over the per-axis clamped bins
      val strides = edges.map(_.size - 1).scanRight(1)(_ * _).tail
      val flat = ids.map(_._1).zip(strides).map { case (id, s) => id * s }.reduce(_ + _)
      val body = element_at(array(values.map(lit): _*), flat + 1)
      val oor = ids.flatMap(_._2).reduceOption(_ || _)
      oor.fold(body)(c => when(c, flowValue(flow)).otherwise(body))
    case Category(in, keys, intKeys, default) =>
      val v = if (intKeys) args(in).cast("long") else args(in)
      val base = default.map(evalNode(_, args)).getOrElse(lit(null).cast("double"))
      keys.foldLeft(base) { case (acc, (k, node)) =>
        val kv = if (intKeys) lit(k.toLong) else lit(k)
        when(v === kv, evalNode(node, args)).otherwise(acc)
      }
  }

  // --- SQL mirror (DuckDB) ----------------------------------------------

  private def sqlBinWithFlow(e: String, edges: IndexedSeq[Double], flow: Flow): (String, Option[String]) = {
    val ax = axisOf(edges)
    val id = ax.binIdSql(e)
    val clamped = s"LEAST(GREATEST($id, 0), ${ax.nBins - 1})"
    flow match {
      case Flow.Clamp => (clamped, None)
      case _ => (clamped, Some(s"(($id) < 0 OR ($id) >= ${ax.nBins})"))
    }
  }

  // Value literals render as DOUBLE (BinnedTable.dLit): bare decimals
  // parse as DECIMAL in DuckDB and make oracle-side arithmetic exact
  // where Spark's is IEEE — the one-ulp gap flips rounding ties (q70).
  private def sqlFlowValue(flow: Flow): String = flow match {
    case Flow.Const(v) => BinnedTable.dLit(v)
    case _ => "NULL"
  }

  private def sqlNode(n: Node, args: Map[String, String]): String = n match {
    case Scalar(v) => BinnedTable.dLit(v)
    case Linear(in, xs, ys) => BinnedTable.Interp1D(xs, ys).sql(args(in))
    case Binning(in, edges, content, flow) =>
      val (id, oor) = sqlBinWithFlow(args(in), edges, flow)
      val body =
        if (content.forall(_.isInstanceOf[Scalar])) {
          val list = BinnedTable.dList(content.map(_.asInstanceOf[Scalar].v))
          s"($list)[($id) + 1]"
        } else {
          val cases = content.zipWithIndex.tail.map { case (node, i) =>
            s"WHEN ($id) = $i THEN ${sqlNode(node, args)}"
          }.mkString(" ")
          s"(CASE $cases ELSE ${sqlNode(content.head, args)} END)"
        }
      oor.fold(body)(c => s"(CASE WHEN $c THEN ${sqlFlowValue(flow)} ELSE $body END)")
    case MultiBinning(ins, edges, values, flow) =>
      val ids = ins.zip(edges).map { case (in, e) => sqlBinWithFlow(args(in), e, flow) }
      val strides = edges.map(_.size - 1).scanRight(1)(_ * _).tail
      val flat = ids.map(_._1).zip(strides).map { case (id, s) => s"($id) * $s" }.mkString(" + ")
      val list = BinnedTable.dList(values)
      val body = s"($list)[($flat) + 1]"
      val oor = ids.flatMap(_._2).reduceOption((a, b) => s"($a OR $b)")
      oor.fold(body)(c => s"(CASE WHEN $c THEN ${sqlFlowValue(flow)} ELSE $body END)")
    case Category(in, keys, intKeys, default) =>
      val e = args(in)
      val cases = keys.map { case (k, node) =>
        val kv = if (intKeys) k else s"'$k'"
        s"WHEN $e = $kv THEN ${sqlNode(node, args)}"
      }.mkString(" ")
      val dflt = default.map(sqlNode(_, args)).getOrElse("NULL")
      s"(CASE $cases ELSE $dflt END)"
  }

  // --- parsing -----------------------------------------------------------

  def parse(json: String): CorrectionSet = {
    val root = JsonMethods.parse(json)
    val version = root \ "schema_version" match {
      case JInt(v) => v.toInt
      case _ => 2
    }
    val corrs = root \ "corrections" match {
      case JArray(cs) => cs.map(parseCorrection)
      case _ => fail("payload has no 'corrections' array")
    }
    CorrectionSet(version, corrs.map(c => c.name -> c).toMap)
  }

  def loadFile(path: String): CorrectionSet =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private def parseCorrection(j: JValue): Correction = {
    val name = str(j \ "name", "correction name")
    val version = j \ "version" match { case JInt(v) => v.toInt; case _ => 1 }
    val ins = j \ "inputs" match {
      case JArray(is) => is.map(i => Input(str(i \ "name", "input name"),
        str(i \ "type", "input type"))).toIndexedSeq
      case _ => IndexedSeq.empty
    }
    Correction(name, version, ins, parseNode(j \ "data", name))
  }

  private def parseNode(j: JValue, ctx: String): Node = j match {
    case JDouble(v) => Scalar(v)
    case JInt(v) => Scalar(v.toDouble)
    case JDecimal(v) => Scalar(v.toDouble)
    case obj: JObject => str(obj \ "nodetype", s"nodetype in $ctx") match {
      case "binning" =>
        val edges = doubles(obj \ "edges", s"binning edges in $ctx")
        val content = arr(obj \ "content", s"binning content in $ctx")
          .map(parseNode(_, ctx)).toIndexedSeq
        // a truncated payload must fail HERE, not as silent NULL lookups
        // (element_at past the end of the value array) at evaluation time
        if (content.size != edges.size - 1)
          fail(s"binning in $ctx has ${edges.size - 1} bins but ${content.size} content entries")
        Binning(str(obj \ "input", s"binning input in $ctx"), edges, content,
          parseFlow(obj \ "flow", ctx))
      case "multibinning" =>
        val ins = arr(obj \ "inputs", s"multibinning inputs in $ctx")
          .map(str(_, "input")).toIndexedSeq
        val edges = arr(obj \ "edges", s"multibinning edges in $ctx")
          .map(e => doubles(e, s"edge list in $ctx")).toIndexedSeq
        val values = doubles(obj \ "content", s"multibinning content in $ctx")
        if (ins.size != edges.size)
          fail(s"multibinning in $ctx declares ${ins.size} inputs but ${edges.size} edge lists")
        val cells = edges.map(_.size - 1).product
        if (values.size != cells)
          fail(s"multibinning in $ctx has $cells cells but ${values.size} content entries")
        MultiBinning(ins, edges, values, parseFlow(obj \ "flow", ctx))
      case "category" =>
        val items = arr(obj \ "content", s"category content in $ctx").map { it =>
          val (key, isInt) = it \ "key" match {
            case JString(s) => (s, false)
            case JInt(v) => (v.toString, true)
            case other => fail(s"category key in $ctx must be string or int, got $other")
          }
          (key, isInt, parseNode(it \ "value", ctx))
        }
        val intKeys = items.forall(_._2) && items.nonEmpty
        require(items.forall(_._2 == intKeys) || items.isEmpty,
          s"category keys in $ctx mix string and int")
        val default = obj \ "default" match {
          case JNothing | JNull => None
          case d => Some(parseNode(d, ctx))
        }
        Category(str(obj \ "input", s"category input in $ctx"),
          items.map(i => (i._1, i._3)).toIndexedSeq, intKeys, default)
      case "linear" =>
        Linear(
          str(obj \ "input", s"linear input in $ctx"),
          doubles(obj \ "xs", s"linear xs in $ctx"),
          doubles(obj \ "ys", s"linear ys in $ctx"))
      case other => fail(s"unsupported nodetype '$other' in $ctx " +
        "(supported: binning, multibinning, category, linear, scalar)")
    }
    case other => fail(s"unsupported node in $ctx: $other")
  }

  private def parseFlow(j: JValue, ctx: String): Flow = j match {
    case JString("clamp") => Flow.Clamp
    case JString("error") => Flow.Null
    case JDouble(v) => Flow.Const(v)
    case JInt(v) => Flow.Const(v.toDouble)
    case JNothing | JNull => Flow.Clamp
    case other => fail(s"unsupported flow in $ctx: $other (clamp, error, or a number)")
  }

  private def str(j: JValue, what: String): String = j match {
    case JString(s) => s
    case other => fail(s"expected string for $what, got $other")
  }
  private def arr(j: JValue, what: String): List[JValue] = j match {
    case JArray(xs) => xs
    case other => fail(s"expected array for $what, got $other")
  }
  private def doubles(j: JValue, what: String): IndexedSeq[Double] =
    arr(j, what).map {
      case JDouble(v) => v
      case JInt(v) => v.toDouble
      case JDecimal(v) => v.toDouble
      case other => fail(s"expected number in $what, got $other")
    }.toIndexedSeq

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"payload parse error: $msg")
}
