package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding (BPE) vocabulary training and
  * segmentation — the subword-tokenizer construction step of an LLM data
  * pipeline (Sennrich, Haddow & Birch 2016, ACL — public algorithm).
  * The reference has no tokenizer training; this extends the engine the
  * same way the dedup/curation family does.
  *
  * Scale design (100 TB corpus): BPE training is a function of the WORD
  * FREQUENCY TABLE, not the corpus — after one distributed
  * `groupBy(word).count` pass (the only corpus-sized work, classic
  * map-side-combine shape), every merge round runs over the vocab-sized
  * symbol table: explode adjacent symbol pairs weighted by word count,
  * one small exchange to sum them, one driver scalar (the argmax pair —
  * the stitching/PageRank driver-scalar pattern), and a map-side HOF
  * rewrite of the symbol arrays. k merges = k vocab-sized exchanges;
  * the corpus is touched exactly once. `localCheckpoint` every few
  * rounds truncates the iterative lineage (the PageRank idiom).
  *
  * Determinism: the argmax pair breaks count ties lexicographically on
  * (left, right) — training is reproducible across partitionings,
  * retries, and cluster sizes.
  *
  * The left-to-right greedy merge scan is implemented as an array fold
  * (`aggregate`): append the symbol, or fuse it with the accumulator's
  * last element when they form the merge pair. The fold equals the
  * textbook skip-scan because a fused token's string (`left+right`)
  * can never equal `left` again (right is non-empty), so a token
  * produced this round is never re-fused with the following symbol
  * except through genuine adjacency — including the overlapping
  * "aaa" case, which fuses (aa)(a) in both formulations.
  */
object Bpe {

  /** End-of-word marker (the classic `</w>`): distinguishes "est" inside
    * "widest" from "est" at a word boundary. */
  val EndOfWord = "</w>"

  /** One learned merge: rank order, the fused pair, and its weighted
    * adjacency count at the time of the merge. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Word-frequency table from a whitespace-tokenized corpus: the single
    * corpus-sized pass of BPE training. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Train `nMerges` BPE merge rules over the corpus' word-frequency
    * table. Stops early when no adjacent pair occurs twice. Returns the
    * merges in rank order. */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): Seq[Merge] = {
    val words = wordCounts(docs, textCol)
    // chars + </w>; split-on-empty yields the character array
    var syms = words.select(col("cnt"),
      concat(split(col("word"), ""), array(lit(EndOfWord))).as("syms"))
      .localCheckpoint() // vocab-sized; pins the one corpus pass
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      // fully-fused words (one symbol) contribute no pairs and would turn
      // the index sequence descending — drop them from pair counting only
      val best = syms
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(element_at(col("syms"), i + 1).as("a"),
              element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(desc("n"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < 2) exhausted = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, a, b, n)
        syms = syms.select(col("cnt"), applyMergeCol(col("syms"), a, b).as("syms"))
        if ((r + 1) % 5 == 0) syms = syms.localCheckpoint()
        r += 1
      }
    }
    merges.toSeq
  }

  /** The greedy left-to-right merge of one pair as a column fold. */
  private def applyMergeCol(syms: org.apache.spark.sql.Column,
                            a: String, b: String) =
    aggregate(syms, array().cast("array<string>"),
      // `get` is the null-safe (0-based) element read: on the empty
      // accumulator it yields null and the null-safe === makes the
      // branch false, where ANSI element_at would error
      (acc, s) => when(
        get(acc, size(acc) - 1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Apply learned merges to a document batch: whitespace-tokenize,
    * decompose each word to characters + `</w>`, fuse pairs in rank
    * order, and emit the subword token stream per document. A
    * `mapPartitions` kernel (merges ride the closure, rank-indexed hash
    * map) rather than k nested column expressions — k merges as nested
    * HOFs would blow janino's 64 KB method limit (the PQ-encode lesson).
    * Map-side only; document text never shuffles. */
  def encodeBatch(df: DataFrame, merges: Seq[Merge], id: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType),
      StructField("tokens", ArrayType(StringType)),
      StructField("n_tokens", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(id)
    val tIdx = df.schema.fieldIndex(textCol)
    val rank: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    df.mapPartitions { rows =>
      rows.map { r =>
        val text = r.getString(tIdx)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
          var toks = w.map(_.toString).toBuffer += EndOfWord
          // fuse the lowest-rank adjacent pair until none applies — the
          // standard encode order, identical to replaying merges in rank
          // order because fusing a lower rank first never creates a pair
          // of even lower rank than one already available
          var done = false
          while (!done && toks.length > 1) {
            var bestRank = Int.MaxValue
            var bestAt = -1
            var i = 0
            while (i < toks.length - 1) {
              val rk = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
              if (rk < bestRank) { bestRank = rk; bestAt = i }
              i += 1
            }
            if (bestAt < 0) done = true
            else {
              toks(bestAt) = toks(bestAt) + toks(bestAt + 1)
              toks.remove(bestAt + 1)
            }
          }
          out ++= toks
        }
        Row(r.getLong(idIdx), out.toSeq, out.length)
      }
    }(enc)
  }
}
