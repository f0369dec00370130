package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Buffer-algebra properties of the native vector-mean aggregate: the
  * partial/merge path must be indistinguishable from a single sequential
  * pass (that is what makes the distributed result deterministic), and
  * serde must be lossless (buffers cross the exchange serialized). */
object VectorAggProperties extends Properties("GridVectorMean") {

  private val grid = 1e3
  private def mkAgg =
    GridVectorMean(BoundReference(0, ArrayType(DoubleType), nullable = true), grid)

  private def row(v: List[Double]): InternalRow =
    InternalRow(new GenericArrayData(v.toArray))

  private def runAll(rows: Seq[List[Double]]): GridVectorMean.Buffer = {
    val a = mkAgg
    rows.foldLeft(a.createAggregationBuffer())((b, v) => a.update(b, row(v)))
  }

  private def evalSums(b: GridVectorMean.Buffer): (Long, List[Long]) =
    (b.n, Option(b.sums).map(_.toList).getOrElse(Nil))

  private val batches: Gen[List[List[Double]]] = for {
    dim <- Gen.choose(1, 8)
    n <- Gen.choose(1, 24)
    rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-1e3, 1e3)))
  } yield rows

  property("any split + merge equals one sequential pass") =
    forAll(batches, Gen.choose(0, 100)) { (rows, cut) =>
      val k = cut % (rows.size + 1)
      val a = mkAgg
      val merged = a.merge(runAll(rows.take(k)), runAll(rows.drop(k)))
      evalSums(merged) == evalSums(runAll(rows))
    }

  property("serialize/deserialize is lossless") =
    forAll(batches) { rows =>
      val a = mkAgg
      val b = runAll(rows)
      evalSums(a.deserialize(a.serialize(b))) == evalSums(b)
    }

  property("eval is the elementwise mean of HALF_UP grid-rounded components") =
    forAll(batches) { rows =>
      val out = mkAgg.eval(runAll(rows)).asInstanceOf[ArrayData].toDoubleArray()
      val dim = rows.head.size
      val expect = (0 until dim).map { i =>
        rows.map(r => java.math.BigDecimal.valueOf(r(i) * grid)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).sum
          .toDouble / grid / rows.size
      }
      out.toSeq == expect
    }

  property("null rows do not perturb the buffer") =
    forAll(batches) { rows =>
      val a = mkAgg
      val withNulls = rows.foldLeft(a.createAggregationBuffer()) { (b, v) =>
        a.update(a.update(b, InternalRow(null)), row(v))
      }
      evalSums(withNulls) == evalSums(runAll(rows))
    }
}
