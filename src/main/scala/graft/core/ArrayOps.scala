package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Intra-row ragged-array algebra completing SURVEY §1.3: the awkward-array
  * shape utilities that have no single Spark builtin. All of these are pure
  * higher-order-function expressions over one row's arrays — embarrassingly
  * parallel, no shuffle, inside whole-stage codegen. Quadratic terms are
  * per-event (collection sizes of dozens), so they scale with row count,
  * not data size.
  *
  * Indexing convention: 1-based everywhere, matching Spark's `element_at`.
  */
object ArrayOps {

  /** Scatter a compact value array back into the shape of a boolean mask
    * (reference embed_with_mask: columnflow/columnar_util.py:1189-1283):
    * position i takes the next unconsumed value where the mask is true,
    * `default` elsewhere. `values` must have exactly countTrue(mask)
    * elements. */
  def embedWithMask(values: Column, mask: Column, default: Column): Column =
    transform(mask, (m, i) =>
      when(m, element_at(values,
        aggregate(slice(mask, lit(1), i + 1), lit(0),
          (acc, x) => acc + when(x, 1).otherwise(0))))
        .otherwise(default))

  /** Array shaped like `arr`, every element `value` (reference full_like:
    * columnflow/columnar_util.py:1240-1260). */
  def fullLike(arr: Column, value: Column): Column =
    transform(arr, _ => value)

  /** Replace the element at 1-based `idx` (reference fill_at:
    * columnflow/columnar_util.py:1261-1283). */
  def fillAt(arr: Column, idx: Column, value: Column): Column =
    transform(arr, (x, i) => when(i === idx - 1, value).otherwise(x))

  /** Carve a flat array into sublists sized like `template`'s sublists
    * (reference layout_ak_array: columnflow/columnar_util.py:1390-1404 —
    * re-ragging a flat result by the layout of another array). */
  def layoutLike(flat: Column, template: Column): Column =
    transform(template, (sub, i) =>
      slice(flat,
        aggregate(slice(template, lit(1), i), lit(0), (a, s) => a + size(s)) + 1,
        size(sub)))

  /** Boolean mask of length `n` with true at the given 1-based indices
    * (reference mask_from_indices: columnflow/columnar_util.py:1163-1188). */
  def maskFromIndices(indices: Column, n: Column): Column =
    // n = 0 must yield []: sequence(1, 0) would count DOWN, not empty
    when(n > 0, transform(sequence(lit(1), n), i => array_contains(indices, i)))
      .otherwise(array().cast("array<boolean>"))

  /** 1-based indices of the mask's true positions, ordered ascending by
    * the parallel `key` array (ties keep position order) — the pt-sorted
    * selection shape (reference sorted_indices_from_mask:
    * columnflow/columnar_util.py:1134-1161). */
  def sortedIndicesFromMask(mask: Column, key: Column): Column = {
    val tagged = zip_with(
      transform(key, (k, i) => struct(k.as("k"), (i + 1).as("i"))),
      mask,
      (p, m) => when(m, p))
    transform(array_sort(filter(tagged, _.isNotNull)), p => p.getField("i"))
  }
}
