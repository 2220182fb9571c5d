package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE tokenizer SERVING at ingest: the merge list t46 trains offline,
  * applied to each arriving word as a stateless per-row fold — the
  * train/serve split for tokenization (IvfIndex/ClassifierIndex's
  * lifecycle applied to the tokenizer itself). Each learned merge
  * (l, r) becomes one `aggregate()` fold over the word's symbol array:
  * push the symbol, and when the accumulator's top equals `l` and the
  * incoming symbol equals `r`, replace the top with the merged symbol.
  * The left fold IS greedy-leftmost application — after a merge the new
  * top is the merged symbol, so an overlapping re-match ("aaa" under
  * (a,a)) cannot fire, exactly the gaps-and-islands semantics the batch
  * trainer applies — and chaining the folds in training order matches
  * the batch's round-by-round rewrite because rounds are per-word
  * independent. Cost per word: Σ|symbols| array pushes across K folds —
  * stateless, no shuffle, no model join (merges are plan literals). */
object StreamingBpeApply {

  /** One merge's greedy-leftmost application to a symbol array. */
  def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(lit(l), lit(r)))))
        .otherwise(concat(acc, array(s))))

  /** The full trained tokenizer: chars of the `wordCol` column through
    * every merge in training order. */
  def tokenize(wordCol: String, merges: Seq[(String, String)]): Column = {
    // sequence(1, 0) is the DESCENDING array [1, 0], so a zero-length
    // word would yield two empty-string symbols; guard to the empty
    // array, matching the trainer's `word <> ''` filter.
    val chars = expr(
      s"CASE WHEN length($wordCol) > 0 THEN " +
        s"transform(sequence(1, length($wordCol)), " +
        s"i -> substring($wordCol, i, 1)) " +
        s"ELSE CAST(array() AS array<string>) END")
    merges.foldLeft(chars: Column) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }
  }
}
