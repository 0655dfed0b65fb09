package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic pseudonymization — replace a direct identifier with a
  * salted-hash pseudonym so joins, sessionization, retention and dedup
  * still work across tables and days (same input ⇒ same pseudonym)
  * while the raw identifier leaves the pipeline. The transcript-corpus
  * use: user/conversation ids must not reach training data, but
  * per-user aggregation still has to group correctly.
  *
  * The pseudonym is the first `hexLen` hex chars of md5(salt:id) —
  * deliberately the engine-portable construction ([[Sampling
  * .hashPoint]] precedent), so the oracle can replay it byte-for-byte.
  * Truncation is a real trade: shorter pseudonyms leak less length/
  * format information but RISK COLLISIONS, and a collision silently
  * MERGES two identities — corrupting every downstream per-user count.
  * That is why [[collisionAudit]] exists and why a pipeline should
  * gate on `n_collisions == 0` before shipping: at 64 bits (hexLen 16)
  * the birthday bound crosses ~50% around 5·10^9 ids, so 10^12-row
  * tables with ~10^9 users are already in audit-mandatory territory.
  *
  * [[pseudonymize]] is pure map-side (zero shuffles, codegen'd md5);
  * [[collisionAudit]] is one aggregate (two exact distinct counts —
  * the honest price; a sketch estimate cannot certify zero
  * collisions). NULL ids stay NULL (no identity, no pseudonym).
  */
object Anonymize {

  def pseudoCol(id: Column, salt: String, hexLen: Int): Column =
    when(id.isNull, lit(null))
      .otherwise(substring(
        md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, hexLen))

  /** Adds `pseudoName` next to the existing columns; drop the raw id
    * yourself once downstream no longer needs it. */
  def pseudonymize(df: DataFrame, idCol: String, salt: String,
      hexLen: Int = 16, pseudoName: String = "pseudo_id"): DataFrame = {
    require(hexLen >= 1 && hexLen <= 32, "hexLen must be in [1, 32]")
    df.withColumn(pseudoName, pseudoCol(col(idCol), salt, hexLen))
  }

  /** One row: (n_rows, n_ids, n_pseudos, n_collisions) where
    * n_collisions = n_ids − n_pseudos (identities silently merged by
    * truncation). Gate on zero before shipping pseudonymized data. */
  def collisionAudit(df: DataFrame, idCol: String, salt: String,
      hexLen: Int = 16): DataFrame = {
    require(hexLen >= 1 && hexLen <= 32, "hexLen must be in [1, 32]")
    df.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(idCol)).as("n_ids"),
        countDistinct(pseudoCol(col(idCol), salt, hexLen))
          .as("n_pseudos"))
      .withColumn("n_collisions", col("n_ids") - col("n_pseudos"))
  }
}
