package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Dedup.exactSubstrStats — the ExactSubstr duplicate-span operator.
  * Hand fixture pins the interval-union arithmetic (a shared run counts
  * its LENGTH, overlapping runs merge); a randomized fixture is checked
  * against an independent brute-force model (boolean coverage array over
  * window-equality, no shared code with the operator).
  */
class ExactSubstrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Independent model: position p of doc d is covered iff some window
    * w[p..p+n) equals a window of ANOTHER doc; dup_tokens = |union of
    * covered [p, p+n)|.
    */
  private def model(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    }
    val windows: Seq[(Long, Int, Vector[String])] = toks.flatMap {
      case (id, w) =>
        if (w.length >= n) (0 to w.length - n).map(i => (id, i, w.slice(i, i + n)))
        else Nil
    }
    val docsOfGram: Map[Vector[String], Set[Long]] =
      windows.groupBy(_._3).map { case (g, ws) => g -> ws.map(_._1).toSet }
    toks.map { case (id, w) =>
      val covered = new Array[Boolean](w.length)
      windows.foreach { case (wid, p, g) =>
        if (wid == id && (docsOfGram(g) - id).nonEmpty)
          (p until p + n).foreach(covered(_) = true)
      }
      val dup = covered.count(identity).toLong
      val frac = if (w.nonEmpty) dup.toDouble / w.length else 0.0
      id -> (w.length.toLong, dup, frac)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], n: Int)
      : Map[Long, (Long, Long, Double)] =
    Dedup.exactSubstrStats(docs.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, nt, dt, df) => id -> (nt, dt, df) }.toMap

  test("hand fixture: run length counts, overlap merge, case-fold, zeros") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6-token run
    val docs = Seq(
      // docs 1/2 share the 6-token run (n=3 => all 6 tokens covered in
      // both), embedded at different positions with unique context
      (1L, s"one two $shared end1a end1b"),
      (2L, s"$shared tail2a tail2b tail2c"),
      // doc 3: unique text, same length as others — zero coverage
      (3L, "u3a u3b u3c u3d u3e u3f u3g u3h"),
      // doc 4: repeats a 3-gram INTERNALLY only — cross-doc rule says 0
      (4L, "rep one rep two rep one rep two x4"),
      // doc 5: shorter than n tokens — no windows, 0/0 guarded
      (5L, "tiny doc"),
      // doc 6: case variant of doc 3's middle — tokenization lower()s, so
      // the run matches doc 3 and BOTH gain coverage
      (6L, "U3C U3D U3E pad6a pad6b pad6c pad6d pad6e")
    )
    val got = run(docs, n = 3)
    assert(got == model(docs, 3), got.toString)
    // pinned values, independent of the model code
    assert(got(1L) == (10L, 6L, 0.6))
    assert(got(2L) == (9L, 6L, 6.0 / 9.0))
    assert(got(3L) == (8L, 3L, 0.375)) // u3c u3d u3e matched by doc 6
    assert(got(4L) == (9L, 0L, 0.0))
    assert(got(5L) == (2L, 0L, 0.0))
    assert(got(6L) == (8L, 3L, 0.375))
  }

  test("two overlapping shared runs union, not double-count") {
    // doc 1 shares w[0..5) with doc 2 and w[3..8) with doc 3 => union 8
    val docs = Seq(
      (1L, "a b c d e f g h z1 z2"),
      (2L, "a b c d e y1 y2 y3 y4 y5"),
      (3L, "d e f g h x1 x2 x3 x4 x5")
    )
    val got = run(docs, n = 5)
    assert(got == model(docs, 5), got.toString)
    assert(got(1L) == (10L, 8L, 0.8))
  }

  test("the md5 window sweep is staged: plan reads the checkpoint, never " +
    "re-scans the source (three consumers, one sweep)") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrStats(docs, n = 3)
    val plan = out.queryExecution.executedPlan.toString
    // positive anchor + absence (the ReviewFixesSpec convention): the plan
    // must read the staged checkpoint and must NOT re-scan the local
    // source or re-run the digest sweep above the stage
    assert(plan.contains("Scan ExistingRDD"), plan.take(1500))
    assert(!plan.contains("LocalTableScan"), plan.take(1500))
    assert(!plan.contains("md5"), "window sweep leaked above the stage")
  }

  test("randomized corpora match the brute-force model") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (trial <- 0 until 3) {
      val docs = (0L until 30L).map { id =>
        val len = 4 + rnd.nextInt(20)
        id -> Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val n = 3 + trial // 3, 4, 5
      assert(run(docs, n) == model(docs, n), s"trial $trial n=$n")
    }
  }
}
