package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation — the boundary stage between
  * document-level ops and [[Chunker]]'s token windows (RAG chunking,
  * per-sentence quality filters, parallel-corpus alignment all want
  * sentence units, not byte offsets).
  *
  * Portable-regex contract (the [[Extract]] convention — Java ∩ RE2, so
  * the same pass replays in SQL): RE2 has no lookbehind, so the split
  * is the two-step "mark then split" — rewrite each terminator run
  * `[.!?]+` followed by whitespace into `terminators + U+001E` and
  * split on the marker (`chr(30)` in SQL — never occurs in prose).
  * Abbreviation handling is explicitly OUT of scope (a rule list is
  * locale policy, not engine mechanics); trailing terminator-less text
  * is kept as a final sentence. Row-local projection plus one keyed
  * window for the dense index — shards on the document id.
  */
object Sentences {

  private val marker = "\u001e"

  /** One row per non-empty sentence: (idCol, sent_idx 1-based over the
    * kept sentences, sentence trimmed, n_words whitespace-token count).
    */
  def split(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val marked = regexp_replace(col(textCol), "([.!?]+)\\s+", "$1" + marker)
    df
      .select(col(idCol), posexplode(org.apache.spark.sql.functions.split(marked, marker)))
      .withColumn("sentence", trim(col("col")))
      .where(length(col("sentence")) > 0)
      // re-rank after dropping empty splits so indices stay dense; the
      // window shards on the document id
      .withColumn("sent_idx",
        row_number().over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .withColumn("n_words",
        size(org.apache.spark.sql.functions.split(col("sentence"), "\\s+")))
      .select(col(idCol), col("sent_idx"), col("sentence"), col("n_words"))
  }
}
