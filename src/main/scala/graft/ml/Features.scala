package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Rand, Text}

/** Feature extraction for model training over text: the hashing trick
  * (feature index = portable hash of the token, modulo the feature-space
  * size) in sparse (id, dim, tf) form — the input shape `ml/Trainer`'s
  * normal-equations fit and any SGD consumer take.
  *
  * The dimension hash is the engine-portable md5-derived 16-bit value
  * (same primitive as `Rand.portableUniform`), so feature vectors are
  * reproducible across engines and across runs — no vocabulary to fit,
  * no drift between training and serving, the whole point of hashed
  * features at corpus scale. Map-side explode + one (id, dim) count
  * aggregation; document text never shuffles.
  */
object Features {

  /** 16-bit portable token hash (first 4 md5 hex digits). */
  private def tokenHash16(tok: Column): Column = Rand.portableHexNum(0, tok)

  /** Sparse hashed term-frequency features: (idCol, dim, tf) with
    * `dim = md5_16(token) mod dims`. */
  def hashedFeatures(docs: DataFrame, dims: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims >= 2 && dims <= 65536, "dims must be in [2, 65536]")
    docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), pmod(tokenHash16(col("__t")), lit(dims)).cast("int").as("dim"))
      .agg(count(lit(1)).as("tf"))
  }

  /** DuckDB mirror of the dim assignment for oracle queries. */
  def dimSql(tokExpr: String, dims: Int): String = {
    val digits = (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substring(md5($tokExpr), ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}"
    }.mkString(" + ")
    s"CAST(($digits) % $dims AS INT)"
  }
}
