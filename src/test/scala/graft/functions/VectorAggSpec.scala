package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class VectorAggSpec extends SparkSpec {

  private def explodeForm(df: DataFrame, grid: Double): Map[(Int, Int), Double] =
    df.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(round(col("x").cast("double") * grid).cast("long")).cast("double") /
        grid / count(lit(1))).as("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

  private def nativeForm(df: DataFrame, grid: Double): Map[(Int, Int), Double] =
    df.groupBy("cell")
      .agg(GridVectorMean.gridMeanVec(col("v"), grid).as("m"))
      .collect()
      .flatMap(r => r.getSeq[Double](1).zipWithIndex.map { case (m, p) => (r.getInt(0), p) -> m })
      .toMap

  test("GridVectorMean is bit-identical to the explode+round+sum formulation") {
    val s = spark
    import s.implicits._
    // includes exact negative .5 grid points: Spark round() is HALF_UP
    // away from zero (-2.5 → -3), where Math.round would give -2
    val df = Seq(
      (0, Seq(-2.5, 3.5, 0.1)),
      (0, Seq(1.25, -3.5, 2.7)),
      (1, Seq(0.0, 0.5, -0.5)),
      (1, Seq(7.125, 2.5, 1e-9))).toDF("cell", "v")
    assert(nativeForm(df, 1.0) == explodeForm(df, 1.0))
    assert(nativeForm(df, 1e7) == explodeForm(df, 1e7))
  }

  test("partial aggregation ≡ single pass (merge associativity) on float input") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map(i => (i % 3, Seq.tabulate(8)(d => (math.sin(i * 8 + d) * 5).toFloat)))
    val one = nativeForm(rows.toDF("cell", "v").coalesce(1), 1e7)
    val many = nativeForm(rows.toDF("cell", "v").repartition(13), 1e7)
    assert(one == many)
    assert(one == explodeForm(rows.toDF("cell", "v"), 1e7))
  }

  test("null vectors are skipped; all-null group yields null; ragged input fails") {
    val s = spark
    import s.implicits._
    val df = Seq((0, Some(Seq(2.0, 4.0))), (0, None), (1, None)).toDF("cell", "v")
    val out = df.groupBy("cell").agg(GridVectorMean.gridMeanVec(col("v"), 1.0).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(0).get.asInstanceOf[scala.collection.Seq[Double]].toSeq == Seq(2.0, 4.0))
    assert(out(1).isEmpty)
    val ragged = Seq((0, Seq(1.0)), (0, Seq(1.0, 2.0))).toDF("cell", "v")
    intercept[Exception] {
      ragged.groupBy("cell").agg(GridVectorMean.gridMeanVec(col("v"), 1.0)).collect()
    }
  }

  test("non-array input fails at analysis, not execution") {
    val s = spark
    import s.implicits._
    val err = intercept[Exception] {
      Seq((0, 1.0)).toDF("cell", "v")
        .groupBy("cell").agg(GridVectorMean.gridMeanVec(col("v"), 1.0)).collect()
    }
    assert(err.getMessage.contains("grid_vector_mean") || err.getMessage.contains("DATATYPE"))
  }
}
