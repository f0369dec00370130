package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType

/** The MLModel evaluate boundary (SURVEY §2.11 ML; reference MLEvaluation:
  * columnflow/tasks/ml.py:568 — chunked `MLModel.evaluate` writing diff
  * columns). The engine side is a partition-wise batch-scoring contract:
  * the model sees an iterator of rows and appends its output columns; the
  * framework keeps it distributed (one model instance per partition, no
  * driver round-trip, no shuffle). Train stays outside the engine, exactly
  * as in the reference — models arrive serialized (broadcast) and only
  * `evaluate` runs on executors.
  */
trait Evaluator extends Serializable {

  /** Columns this evaluator appends to each row. */
  def outputSchema: StructType

  /** Score a batch. Must return one output Row of `outputSchema` values
    * per input row, in order. */
  def evaluate(rows: Iterator[Row]): Iterator[Row]
}

object Evaluator {

  /** Apply an evaluator: rows keep their columns, the model's outputs are
    * appended. Partition-wise — the 100 TB path is one `mapPartitions`
    * with no exchange. */
  def score(df: DataFrame, ev: Evaluator): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ ev.outputSchema.fields)
    df.mapPartitions { rows =>
      // zip inputs with the model's outputs so input columns survive.
      // duplicate's buffer holds only the model's read-ahead: a lazy
      // evaluator keeps it O(1), a batching one O(batch) — never O(partition)
      val (forModel, forZip) = rows.duplicate
      forZip.zip(ev.evaluate(forModel)).map { case (in, out) =>
        Row.fromSeq(in.toSeq ++ out.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
