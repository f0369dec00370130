package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

class EvaluatorSpec extends SparkSpec {

  private object Doubler extends Evaluator {
    val outputSchema = StructType(Seq(StructField("doubled", DoubleType)))
    def evaluate(rows: Iterator[Row]): Iterator[Row] =
      rows.map(r => Row(r.getAs[Double]("v") * 2))
  }

  test("score appends model outputs and keeps input columns") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.5), (2L, -2.0), (3L, 0.0)).toDF("id", "v").repartition(2)
    val out = Evaluator.score(df, Doubler)
    assert(out.columns.toSeq == Seq("id", "v", "doubled"))
    val m = out.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m == Map(1L -> 3.0, 2L -> -4.0, 3L -> 0.0))
  }

  test("batching evaluators keep row alignment") {
    // consumes input in chunks of 2 — exercises the duplicate() buffer
    val batcher = new Evaluator {
      val outputSchema = StructType(Seq(StructField("batchSum", DoubleType)))
      def evaluate(rows: Iterator[Row]): Iterator[Row] =
        rows.grouped(2).flatMap { batch =>
          val s = batch.map(_.getAs[Double]("v")).sum
          batch.map(_ => Row(s))
        }
    }
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0)).toDF("id", "v").coalesce(1)
    val m = Evaluator.score(df, batcher).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m == Map(1L -> 3.0, 2L -> 3.0, 3L -> 4.0))
  }
}
