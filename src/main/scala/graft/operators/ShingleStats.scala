package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.LongType

/** Per-document 3-gram shingle statistics as a partition kernel —
  * appends `n_tok`, `n_ngrams`, `n_distinct` columns to the input.
  *
  * Why a kernel: the declarative form
  * (`size(array_distinct(transform(sequence(...), i => concat_ws(...))))`)
  * re-evaluates the token split inside the interpreted lambda for every
  * shingle position — measured 6.7 s at sf0.1 on q69 vs ~0.3 s here,
  * the same interpreted-HOF tax class as the round-1 q72/q73/q78
  * incidents (SURVEY.md §7.3 ladder case (d), measured before
  * dropping). Semantics match `TextFns.shingles3` exactly, including
  * the <3-token degenerate case (one whole-text shingle) and trailing
  * empty tokens (`split(" ", -1)`).
  *
  * Scale: map-only over the scan — no shuffle, no state; the HashSet
  * is per-document and bounded by document length.
  */
object ShingleStats {

  def withShingleStats(docs: DataFrame, textCol: String): DataFrame = {
    val outSchema = docs.schema
      .add("n_tok", LongType).add("n_ngrams", LongType).add("n_distinct", LongType)
    val idx = docs.schema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(idx)) null else r.getString(idx)
        if (text == null)
          // declarative parity: size(split(NULL)) is NULL, so a null
          // text yields null stats (callers filter them), not a crash
          Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        else {
          val tok = text.split(" ", -1)
          val n = tok.length
          val nDistinct =
            if (n < 3) 1L
            else {
              val hs = new java.util.HashSet[String](math.max(16, n * 2))
              var i = 0
              while (i <= n - 3) {
                hs.add(tok(i) + " " + tok(i + 1) + " " + tok(i + 2))
                i += 1
              }
              hs.size.toLong
            }
          Row.fromSeq(r.toSeq ++ Seq(n.toLong, (n - 2).toLong, nDistinct))
        }
      }
    }(Encoders.row(outSchema))
  }
}
