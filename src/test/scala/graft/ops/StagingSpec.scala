package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Staging seam (round 6, VERDICT r05 item 3): the durable parquet path
  * must be result-identical to the default localCheckpoint path for every
  * op routed through [[Staging]] — SetJoin (both flavors), Curation, the
  * minhash pair generator, and the CC loop.
  */
class StagingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Run `body` with durable staging into a temp dir; always clears the
    * property (a leak would silently reroute every later suite). */
  private def withDurable[A](body: => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-staging-spec").toString
    System.setProperty("graft.staging.dir", dir)
    try body
    finally {
      System.clearProperty("graft.staging.dir")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  private val docs = ((0 until 40).map { i =>
    val tk = (0 until 6 + i % 4).map(j => s"w${(i * 3 + j * (1 + i % 3)) % 25}")
    (f"d$i%02d", tk.mkString(" "))
  } ++ Seq(
    ("dupa", "alpha beta gamma delta epsilon"),
    ("dupb", "alpha beta gamma delta epsilon"),
    ("dupc", "alpha beta gamma delta zeta"))).toDF("doc_id", "text")

  test("jaccardJoin: durable staging is result-identical (and actually " +
    "wrote staged tables)") {
    val local = SetJoin.jaccardJoin(docs, 500).collect().toSet
    val durable = withDurable {
      val out = SetJoin.jaccardJoin(docs, 500).collect().toSet
      val dir = new java.io.File(sys.props("graft.staging.dir"))
      val staged = Option(dir.listFiles()).getOrElse(Array.empty)
      assert(staged.exists(_.getName.contains("setjoin-tok")) &&
        staged.exists(_.getName.contains("setjoin-ordered")),
        s"expected staged tables under $dir, found " +
          staged.map(_.getName).mkString(", "))
      out
    }
    assert(durable == local && local.nonEmpty)
  }

  test("containmentJoin: durable staging is result-identical") {
    val local = SetJoin.containmentJoin(docs, 700).collect().toSet
    val durable = withDurable {
      SetJoin.containmentJoin(docs, 700).collect().toSet
    }
    assert(durable == local && local.nonEmpty)
  }

  test("curate (incl. minhash banding + CC loop): durable staging is " +
    "result-identical") {
    val eval = Seq(("e0", "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    def run() = Curation.curate(docs, eval,
      minTokens = 2, maxTokens = 50, minMeanTokenLen = 1.0,
      maxMeanTokenLen = 20.0, minAlnumRatio = 0.1, minStopwordHits = 0,
      k = 2, numHashes = 8, bands = 4, maxBandDf = 10,
      contamN = 2, minShared = 1).collect().toSet
    val local = run()
    val durable = withDurable(run())
    assert(durable == local && local.nonEmpty)
    // every verdict class should appear so the equality is meaningful
    assert(local.exists(_.getAs[Boolean]("keep")))
    assert(local.exists(r => !r.getAs[Boolean]("keep")))
  }

  test("minhashLshPairs + nearDupClusters: durable staging is " +
    "result-identical") {
    def run() = Dedup.nearDupClusters(
      docs.select("doc_id"),
      Dedup.minhashLshPairs(docs, k = 2, numHashes = 8, bands = 4))
      .collect().toSet
    val local = run()
    val durable = withDurable(run())
    assert(durable == local && local.nonEmpty)
  }
}
