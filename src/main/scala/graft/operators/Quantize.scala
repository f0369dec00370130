package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-quantization operators over embedding columns: coarse-quantizer
  * (centroid) training, nearest-centroid assignment, one Lloyd refinement
  * step, and product-quantization (PQ) encoding.
  *
  * Scale design (100 TB of embeddings):
  *   - Training is ONE exchange of (cell, dim, partial sum/count) triples —
  *     map-side combine reduces every partition to nCells×dim rows before
  *     the shuffle, so the exchange volume is independent of corpus size.
  *   - Trained centroids are kCells×dim scalars (a few KB) — they ride to
  *     the executors as plan literals, so assignment/encoding is pure
  *     map-side column work inside whole-stage codegen: no join, no
  *     shuffle, no UDF.
  *   - A Lloyd iteration is therefore exactly one exchange; k iterations
  *     are k exchanges of centroid-sized data, never of the corpus.
  *
  * Determinism: centroid means quantize components to an exact 1e-7
  * integer grid before summing (integer sums are order-free; see q58).
  * Distance chains are built as fixed left-associated `(v−c)·(v−c)` sums
  * so repeated evaluation is bit-stable; cross-engine argmin ties break to
  * the lowest centroid id on both sides.
  */
object Quantize {

  /** Grid-exact per-cell mean vectors, collected to the driver (cells ×
    * dim scalars — the IVF coarse quantizer). `grid` is the exactness
    * grid: components are rounded to 1/grid before the integer sum.
    * Uses the native `GridVectorMean` aggregate: whole vectors reach the
    * hash aggregate (n rows, not n×dim exploded rows) and the exchange
    * carries one dim-long buffer per (partition, cell). */
  def trainCentroids(df: DataFrame, cellCol: String, vecCol: String,
                     grid: Double = 1e7): Map[Int, IndexedSeq[Double]] =
    df.groupBy(col(cellCol).cast("int").as("__cell"))
      .agg(graft.functions.GridVectorMean.gridMeanVec(col(vecCol), grid).as("__m"))
      // all-null cells aggregate to a null mean; skip them like the explode
      // formulation (which produced no rows for such groups) did
      .filter(col("__m").isNotNull)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap

  /** Squared L2 distance from an array column to a literal centroid.
    * Native fused kernel with the zip_with/aggregate fold order — a fixed
    * left-associated chain of exact IEEE ops (`-`, `*`, `+`), no libm,
    * bit-stable on re-evaluation and bit-identical to the HOF form
    * (`VectorKernelsSpec`). The kernel call is one generated-code
    * statement per centroid, so k×dim never approaches janino's 64 KB
    * method limit the way an unrolled `element_at` chain does. */
  def dist2(vec: Column, cent: IndexedSeq[Double]): Column =
    graft.functions.VectorKernels.l2ConstCol(vec, cent.toArray)

  /** Nearest-centroid id by squared L2; ties go to the lowest id.
    *
    * Built as distances-array → `array_min` → first `array_position`
    * (ids ascending, so first match = lowest id). A min-keeping
    * `when`-fold would nest each step's best-so-far expression inside the
    * next `when` twice — an exponential expression tree by k centroids;
    * the array form keeps every distance chain exactly once. */
  def assignNearest(vec: Column, cents: Map[Int, IndexedSeq[Double]]): Column = {
    val sorted = cents.toSeq.sortBy(_._1)
    val ds = array(sorted.map { case (_, c) => dist2(vec, c) }: _*)
    val ids = array(sorted.map { case (id, _) => lit(id) }: _*)
    element_at(ids, array_position(ds, array_min(ds)).cast("int"))
  }

  /** One Lloyd refinement step: assign every vector to its nearest
    * centroid, then recompute grid-exact means. Returns one row per
    * (cluster, pos) with the updated component and the cluster size —
    * clusters that lose all members disappear (standard Lloyd's). */
  def lloydStep(df: DataFrame, cents: Map[Int, IndexedSeq[Double]],
                vecCol: String, grid: Double = 1e7): DataFrame =
    df.withColumn("__cl", assignNearest(col(vecCol), cents))
      .groupBy(col("__cl").as("cluster"))
      .agg(
        graft.functions.GridVectorMean.gridMeanVec(col(vecCol), grid).as("__m"),
        count(lit(1)).as("n"))
      .select(col("cluster"), posexplode(col("__m")).as(Seq("__pos", "centroid")), col("n"))
      .select(col("cluster"), (col("__pos") + 1).as("pos"), col("centroid"), col("n"))

  /** Full Lloyd's algorithm: iterate `lloydStep` from `init` until the
    * centroid set is exactly stable (grid-exact means make bitwise
    * convergence well-defined — no epsilon tuning) or `maxIters`. Each
    * iteration costs one corpus exchange; centroids travel driver ↔ plan
    * as literals, so k iterations never shuffle the corpus itself.
    * Returns the final centroids, the iteration count, and whether the
    * set actually stabilized — exhausting `maxIters` while centroids are
    * still moving is otherwise indistinguishable from converging on the
    * last allowed iteration. Clusters that lose all members drop out
    * (standard Lloyd's). */
  def kmeans(df: DataFrame, init: Map[Int, IndexedSeq[Double]], vecCol: String,
             maxIters: Int = 20, grid: Double = 1e7)
      : (Map[Int, IndexedSeq[Double]], Int, Boolean) = {
    var cents = init
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val next = lloydStep(df, cents, vecCol, grid)
        .collect().groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq
        }
      converged = next == cents
      cents = next
      it += 1
    }
    (cents, it, converged)
  }

  /** Slice a trained full-dimension codebook into `m` equal subspace
    * codebooks (dim must divide evenly). Product quantization trains each
    * subspace independently in general; deriving all m slices from one
    * full-vector training pass keeps it to a single exchange. */
  def sliceCodebooks(cents: Map[Int, IndexedSeq[Double]], m: Int)
      : IndexedSeq[Map[Int, IndexedSeq[Double]]] = {
    val dim = cents.head._2.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { s =>
      cents.map { case (id, v) => id -> v.slice(s * sub, (s + 1) * sub) }
    }
  }

  /** PQ encode: an array<int> of m codes, code s = nearest subspace-s
    * codeword to the vector's s-th slice. mCodebooks codewords are plan
    * literals — encoding a 100 TB corpus is map-side only. */
  def pqEncode(vec: Column, codebooks: IndexedSeq[Map[Int, IndexedSeq[Double]]]): Column = {
    val sub = codebooks.head.head._2.length
    array(codebooks.zipWithIndex.map { case (book, s) =>
      assignNearest(slice(vec, s * sub + 1, sub), book)
    }: _*)
  }

  /** ADC (asymmetric distance computation) lookup tables for one query
    * vector: per subspace, codeword-id → partial squared distance of the
    * query's slice to that codeword. Driver-side double arithmetic with
    * the same left fold as `dist2` — the tables are m×k scalars and ride
    * to executors as data in a broadcast-joined query table. */
  def adcTables(query: IndexedSeq[Double],
                codebooks: IndexedSeq[Map[Int, IndexedSeq[Double]]]): Seq[Map[Int, Double]] = {
    val sub = codebooks.head.head._2.length
    codebooks.zipWithIndex.map { case (book, s) =>
      val qs = query.slice(s * sub, (s + 1) * sub)
      book.map { case (id, cw) =>
        id -> qs.zip(cw).foldLeft(0.0) { case (acc, (v, c)) =>
          acc + (v - c) * (v - c)
        }
      }
    }
  }

  /** ADC score of a codes column against a query's lookup tables carried
    * as an `array<map<int,double>>` column: m map lookups summed in
    * subspace order (fixed left fold). The scan side touches only the
    * m-byte code tuple — the full-precision corpus never loads, which is
    * the PQ memory/IO win at 100 TB. */
  def adcScore(codes: Column, tables: Column, m: Int): Column =
    (0 until m).map { s =>
      element_at(element_at(tables, s + 1), element_at(codes, s + 1))
    }.reduce(_ + _)
}
