package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL registration must reach the same kernels as the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("SQL-registered kernels match the Column API bit for bit") {
    val s = spark
    import s.implicits._
    GraftExtensions.register(s)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.5f, 0.5f), "hello", Seq(7L, 8L, 9L)))
      .toDF("a", "b", "s", "h").createOrReplaceTempView("ext_t")

    val viaSql = s.sql("""
      SELECT graft_vec_dot(a, b) AS d,
             graft_md5_lower64(s) AS m,
             graft_simhash64(h) AS sh,
             graft_minhashes(h, 4) AS mh
      FROM ext_t""").head()
    val viaCol = s.table("ext_t").select(
      graft.functions.VectorKernels.dotCol($"a", $"b").as("d"),
      graft.functions.HashKernels.md5Lower64Col($"s").as("m"),
      graft.functions.HashKernels.simhash64Col($"h").as("sh"),
      graft.functions.HashKernels.minhashesCol($"h", 4).as("mh")).head()

    assert(viaSql.getDouble(0) === viaCol.getDouble(0))
    assert(viaSql.getLong(1) === viaCol.getLong(1))
    assert(viaSql.getLong(2) === viaCol.getLong(2))
    assert(viaSql.getSeq[Long](3) === viaCol.getSeq[Long](3))
    assert(viaSql.getDouble(0) === 3.0)
  }

  test("non-literal k in graft_minhashes fails with a readable error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhashes(array(1L), CAST(rand() * 4 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("the build-time extensions class registers the same builder list") {
    // the class only delegates to GraftExtensions.functions — pin that
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders shared
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ===
      Seq("graft_md5_lower64", "graft_minhashes", "graft_simhash64", "graft_vec_dot"))
  }
}
