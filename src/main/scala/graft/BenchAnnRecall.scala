package graft

import graft.ops.Similarity
import graft.pipeline.Fixtures
import org.apache.spark.sql.SparkSession

/** ANN recall capability bench: recall@k of the IVF path vs exact
  * brute-force ground truth on a CLUSTERED fixture, comparing first-K
  * centroid init (lloydRounds=0) against seeded Lloyd refinement — the
  * quantifier behind `Similarity.ivfCentroids`' claim that a few k-means
  * rounds matter on clustered corpora.
  *
  * Fixture: `clusters` direction-clusters of unit-scale centers with small
  * per-point noise, laid out in CONTIGUOUS vec_id blocks — the adversarial
  * (and realistic: sorted ingest) case for first-K init, which then plants
  * every centroid inside cluster 0.
  *
  * The per-centroid list cap (`maxBucketSize`, the guard that is MANDATORY
  * at 100 TB scale) is on: without it, degenerate centroids hide behind a
  * single giant list that amounts to a full scan — high recall, no index.
  * With the cap, bad centroids truncate their one hot list and recall
  * collapses, which is the honest failure mode the Lloyd rounds fix.
  *
  * Prints ONE JSON line and writes BENCH_ANN.json.
  */
object BenchAnnRecall {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_ANN_N", "1500").toInt
    val dim = sys.env.getOrElse("GRAFT_ANN_DIM", "12").toInt
    val clusters = sys.env.getOrElse("GRAFT_ANN_CLUSTERS", "6").toInt
    val k = sys.env.getOrElse("GRAFT_ANN_K", "10").toInt
    val nlist = sys.env.getOrElse("GRAFT_ANN_NLIST", "6").toInt
    val nprobe = sys.env.getOrElse("GRAFT_ANN_NPROBE", "2").toInt
    // ~1.5x the balanced list size: barely felt by good centroids,
    // truncates the one giant list a degenerate quantizer produces
    val cap = sys.env.getOrElse("GRAFT_ANN_CAP",
      (n * 3 / (2 * nlist)).toString).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-ann-recall")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nB = n; val dimB = dim; val clustersB = clusters
    val pts = spark.range(0L, n, 1L, cpus)
      .map { i =>
        // hash-distributed cluster membership: first-K init is then a
        // Forgy-style pseudo-random draw — typically landing duplicate
        // centroids in big clusters and missing small ones, the realistic
        // degradation Lloyd rounds repair (fully-contiguous layouts where
        // ALL nlist init points share one cluster defeat 2-round Lloyd
        // too — k-means cannot re-seed a lost cluster; that case needs
        // k-means++-style init, documented as out of scope)
        val c = ((Fixtures.mix(i + 1) >>> 7) % clustersB).toInt
        val emb = Array.tabulate(dimB) { d =>
          val center = (Fixtures.mix(c * 7919L + d) % 1000L) / 500.0 - 1.0
          val noise = (Fixtures.mix(i * 104729L + d) % 1000L) / 5000.0
          (center + noise).toFloat
        }
        (i, emb)
      }.toDF("vec_id", "embedding")
      .cache()
    pts.count()

    val truth = Similarity.bruteForceTopK(pts, pts, k)
      .select("query_id", "corpus_id").cache()
    val truthRows = truth.count().toDouble

    def recallAt(lloydRounds: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(pts, k, nlist, nprobe,
        maxBucketSize = cap, lloydRounds = lloydRounds)
        .select("query_id", "corpus_id")
      val hit = ann.join(truth, Seq("query_id", "corpus_id")).count()
      (hit / truthRows, (System.nanoTime() - t0) / 1e9)
    }
    val (r0, t0) = recallAt(0)
    val (r2, t2) = recallAt(2)
    val (r5, t5) = recallAt(5)
    spark.stop()

    val json =
      s"""{"bench":"ann_recall","n":$n,"dim":$dim,"clusters":$clusters,""" +
        s""""k":$k,"nlist":$nlist,"nprobe":$nprobe,"cap":$cap,""" +
        f""""recall_init":$r0%.4f,"recall_lloyd2":$r2%.4f,""" +
        f""""recall_lloyd5":$r5%.4f,""" +
        f""""sec_init":$t0%.2f,"sec_lloyd2":$t2%.2f,"sec_lloyd5":$t5%.2f}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_ANN.json"), json + "\n")
    catch { case _: Throwable => () }
    println(json)
  }
}
