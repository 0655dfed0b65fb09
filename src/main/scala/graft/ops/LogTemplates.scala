package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Log template mining — collapse free-text log/telemetry messages into
  * their constant skeletons: messages are grouped by a structural
  * signature (token count + first token, the fixed-depth prefix
  * partition the Drain family of log parsers uses — public literature),
  * and within a group each token position that ever varies is replaced
  * by the `<*>` wildcard. "api request user=7 type=click status=200"
  * and "api request user=9 type=view status=200" mine the template
  * "api request <*> <*> status=200" with its message count — the
  * unsupervised "what kinds of lines are in this firehose" rollup that
  * precedes grok-pattern authoring ([[LogParse]] consumes the patterns
  * this discovers).
  *
  * Tokenization is a literal single-space split (grok-style messages are
  * space-delimited; normalize upstream if tabs matter). NULL messages
  * drop; empty messages form the 1-token template of the empty string.
  *
  * Determinism: the wildcard decision is min(token) == max(token) per
  * (signature, position) — pure aggregate algebra, no distinct-count, no
  * order dependence; the reassembled template sorts by position. The
  * output is a pure function of the input multiset.
  *
  * 100 TB shape: one map-side explode to (signature, position, token)
  * rows, ONE hash shuffle to that key for the per-position collapse
  * (map-side partial min/max/count does the heavy lifting — the exchange
  * moves one row per distinct (signature, position, partition)), then a
  * second exchange over the tiny signature key space to reassemble. No
  * joins, no windows over the corpus, nothing quadratic; a message
  * contributes len(tokens) rows exactly once. Template cardinality is
  * bounded by the signature space, not the corpus.
  */
object LogTemplates {

  /** (n_tokens, first_token, template, n_msgs) per mined template.
    * `n_msgs` counts messages (not tokens): position 0 exists exactly
    * once per message, so the signature's message count is the row count
    * at position 0.
    */
  def mine(df: DataFrame, msgCol: Column): DataFrame = {
    val base = df.select(msgCol.cast("string").as("msg"))
      .where(col("msg").isNotNull)
      .select(split(col("msg"), " ", -1).as("toks"))
    val toks = base.select(
      size(col("toks")).as("n_tokens"),
      element_at(col("toks"), 1).as("first_token"),
      posexplode(col("toks")))
    val positions = toks
      .groupBy(col("n_tokens"), col("first_token"), col("pos"))
      .agg(min(col("col")).as("lo"), max(col("col")).as("hi"),
        count(lit(1)).as("n_rows"))
      .select(col("n_tokens"), col("first_token"), col("pos"),
        when(col("lo") === col("hi"), col("lo")).otherwise(lit("<*>"))
          .as("tok_out"),
        col("n_rows"))
    positions
      .groupBy("n_tokens", "first_token")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            col("tok_out").as("tok")))),
          x => x.getField("tok")), " ").as("template"),
        sum(when(col("pos") === 0, col("n_rows"))).as("n_msgs"))
  }
}
