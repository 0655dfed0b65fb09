package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Vectors are quantized to integers (round(x * 1000)) before any
  * arithmetic so dot products and norms are EXACT integers — scores are
  * then a single double division, bit-identical across engines (the DuckDB
  * oracle reproduces them). Quantization error is irrelevant for ranking
  * quality at 3 decimal places.
  *
  * Scale path: brute-force top-k is the correctness baseline (O(Q x N) with
  * a broadcast query side); `lshBuckets` is the 100 TB path — random
  * hyperplane signatures (seeded, deterministic) bucket the corpus so each
  * query only scans its bucket.
  */
object Similarity {

  /** array<float> -> array<long> quantized at 3 decimals. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine of two quantized vectors: int dot / (sqrt(int)*sqrt(int)). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query side is broadcast — the corpus scan
    * is a single map-side pass, the only shuffle is the per-query top-k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("corpus_id"),
      quantize(col("embedding")).as("cq"))
    val q = queries.select(col("vec_id").as("query_id"),
      quantize(col("embedding")).as("qq"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineQ(col("qq"), col("cq")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }

  /** Deterministic random-hyperplane sign for (plane, dim): +-1 from one
    * md5 hex nibble — reproducible in any engine with md5.
    */
  private def planeSign(plane: Int, dim: Column): Column =
    when(conv(substring(md5(concat(lit(s"p$plane-"), dim.cast("string"))),
      1, 1), 16, 10).cast("int") % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** LSH bucket id: `planes` random-hyperplane sign bits over the quantized
    * vector. Same-bucket vectors are ANN candidates.
    */
  def lshBucket(v: Column, planes: Int): Column = {
    val q = quantize(v)
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(q, sequence(lit(0), size(q) - 1),
          (x, i) => x * planeSign(p, i)),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via LSH buckets: rank within each (bucket, query) group.
    * Approximate — recall depends on `planes`; pairs in different buckets
    * are never compared (that is the point at 100 TB).
    */
  def lshTopK(corpus: DataFrame, k: Int, planes: Int = 6): DataFrame = {
    val withBucket = corpus.select(col("vec_id"),
      quantize(col("embedding")).as("qv"),
      lshBucket(col("embedding"), planes).as("bucket"))
    val a = withBucket.select(col("bucket"), col("vec_id").as("query_id"),
      col("qv").as("qq"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("corpus_id"),
      col("qv").as("cq"))
    val scored = a.join(b, Seq("bucket"))
      .where(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosineQ(col("qq"), col("cq")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "corpus_id", "cosine")
  }
}
