package graft.core

import graft.SparkSpec

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("finiteReport finds NaN and Inf per column, clean frames pass") {
    val df = Seq(
      (1L, 1.0, 2.0f),
      (2L, Double.NaN, Float.NegativeInfinity),
      (3L, Double.PositiveInfinity, 3.0f)
    ).toDF("id", "d", "f")
    assert(Integrity.finiteReport(df).toSet ===
      Set(("d", 1L, 1L), ("f", 0L, 1L)))
    val e = intercept[IllegalArgumentException](Integrity.assertFinite(df))
    assert(e.getMessage.contains("d(nan=1, inf=1)"))
    Integrity.assertFinite(Seq((1L, 1.0)).toDF("id", "v")) // clean: no throw
    assert(Integrity.finiteReport(Seq((1L, "x")).toDF("id", "s")).isEmpty) // no float cols
  }

  test("finiteReport rejects missing or non-float requested columns (no vacuous pass)") {
    val df = Seq((1L, Double.NaN, "x")).toDF("id", "d", "s")
    val typo = intercept[IllegalArgumentException](
      Integrity.assertFinite(df, Seq("dd")))
    assert(typo.getMessage.contains("'dd'"))
    val nonFloat = intercept[IllegalArgumentException](
      Integrity.assertFinite(df, Seq("s")))
    assert(nonFloat.getMessage.contains("not float/double"))
    // a correctly-named float column still checks
    intercept[IllegalArgumentException](Integrity.assertFinite(df, Seq("d")))
  }

  test("assertNoOverlap flags a column produced twice, keys exempt") {
    val a = Seq((1L, 2.0)).toDF("event", "x")
    val b = Seq((1L, 3.0)).toDF("event", "y")
    Integrity.assertNoOverlap(Seq("event"), a, b) // disjoint: fine
    val c = Seq((1L, 4.0)).toDF("event", "x")
    val e = intercept[IllegalArgumentException](
      Integrity.assertNoOverlap(Seq("event"), a, b, c))
    assert(e.getMessage.contains("'x'"))
  }

  test("tableChecksum is row-order and partitioning invariant") {
    import org.apache.spark.sql.functions._
    val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    def sum(d: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(d, Seq(col("k"), col("v"))).head()
    val base = sum(df)
    assert(sum(df.repartition(7)) === base)
    assert(sum(df.orderBy(desc("k"))) === base)
  }

  test("tableChecksum detects a single changed cell and distinguishes null from blank") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val tweaked = Seq((1L, "a"), (2L, "c")).toDF("k", "v")
    def cs(d: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(d, Seq(col("k"), col("v"))).head().getDecimal(1)
    assert(cs(df) !== cs(tweaked))
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
    val withEmpty = Seq((1L, "")).toDF("k", "v")
    assert(cs(withNull) !== cs(withEmpty))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import org.apache.spark.sql.functions._
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20.0), (3L, "z", 31.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val out = Integrity.snapshotDiff(a, b, Seq("k"),
        Seq(col("s"), col("v").cast("decimal(10,2)")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("auditRules counts violations in one aggregate, nulls fail the rule") {
    import org.apache.spark.sql.functions._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (3L, null), (null, 2.0)).toDF("id", "v")
    val out = Integrity.auditRules(df, Seq(
        "v_positive" -> (col("v") > 0),
        "id_not_null" -> col("id").isNotNull))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("v_positive") === ((2L, 4L))) // -1 fails, null v fails
    assert(out("id_not_null") === ((1L, 4L)))
  }

  test("orphanCount finds unmatched and null child keys") {
    val child = Seq[java.lang.Long](1L, 2L, 7L, null).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val n = Integrity.orphanCount(child, parent, "fk", "pk")
      .head().getLong(0)
    assert(n === 2L) // 7 unmatched + null
  }

  test("tableChecksum groups localize the mismatch") {
    import org.apache.spark.sql.functions._
    val a = Seq(("g1", 1L), ("g1", 2L), ("g2", 3L)).toDF("g", "k")
    val b = Seq(("g1", 1L), ("g1", 2L), ("g2", 99L)).toDF("g", "k")
    def m(d: org.apache.spark.sql.DataFrame) =
      Integrity.tableChecksum(d, Seq(col("k")), groupBy = Seq("g"))
        .collect().map(r => r.getString(0) -> r.getDecimal(2)).toMap
    val (ma, mb) = (m(a), m(b))
    assert(ma("g1") === mb("g1"))
    assert(ma("g2") !== mb("g2"))
  }
}
