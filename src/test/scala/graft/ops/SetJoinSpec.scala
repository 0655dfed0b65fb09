package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** SetJoin — exact prefix-filter Jaccard join. */
class SetJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(String, String)], permille: Int,
      cap: Int = SetJoin.DefaultMaxTokenDf) =
    SetJoin.jaccardJoin(docs.toDF("doc_id", "text"), permille, cap)
      .as[(String, String, Long, Long, Long, Double)]
      .collect().toSeq.sortBy(p => (p._1, p._2))

  /** The naive all-pairs definition the prefix filter must equal. */
  private def model(docs: Seq[(String, String)], permille: Int) = {
    val sets = docs.filter(d => d._1 != null && d._2 != null)
      .map { case (id, t) =>
        (id, t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
      }
      .filter(_._2.nonEmpty)
    for {
      (a, sa) <- sets; (b, sb) <- sets
      if a < b
      inter = (sa & sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * 1000 >= permille * union
    } yield (a, b, inter, sa.size.toLong, sb.size.toLong,
      inter.toDouble / union.toDouble)
  }.sortBy(p => (p._1, p._2))

  test("brute-force equivalence: the prefix candidate stage loses no " +
    "qualifying pair and the verify stage admits no extra") {
    // a deterministic corpus with overlap at every level: clones,
    // near-clones, partial overlaps, disjoint docs, repeated tokens
    // (distinct-set semantics), and size-skewed pairs
    val words = (0 until 40).map(i => s"w$i")
    val docs = (0 until 30).map { i =>
      val tk = (0 until 8 + i % 5).map(j => words((i * 3 + j * (1 + i % 4)) % 40))
      (f"d$i%02d", (tk ++ tk.take(i % 3)).mkString(" ")) // planted repeats
    } ++ Seq(
      ("dup-a", "alpha beta gamma delta"),
      ("dup-b", "alpha beta gamma delta"), // exact clone: J = 1
      ("dup-c", "alpha beta gamma delta epsilon")) // 4/5 = 0.8
    for (t <- Seq(300, 500, 800, 1000)) {
      val got = run(docs, t)
      assert(got == model(docs, t), s"permille=$t")
      assert(got.nonEmpty, s"degenerate fixture at permille=$t")
    }
  }

  test("integer threshold boundary: a pair EXACTLY at J = t is kept " +
    "(inter*1000 = permille*union, no float epsilon)") {
    // |a|=|b|=3, inter=2, union=4 -> J=0.5 exactly at permille 500
    val docs = Seq(("a", "x y p"), ("b", "x y q"))
    val got = run(docs, 500)
    assert(got == Seq(("a", "b", 2L, 3L, 3L, 0.5)))
    assert(run(docs, 501).isEmpty)
  }

  test("hot-token cap: stopword-only overlap stops producing join keys " +
    "at the cap; 0 opts out and restores exactness") {
    // 'the'/'of' appear in every doc (df=4, over cap=3); the rare-token
    // pair (r1 r2) survives because its prefix keys are under the cap
    val docs = Seq(
      ("s1", "the of"), ("s2", "the of"), // stopword-only clone pair
      ("r1", "the of r1a r1b"), ("r2", "the of r1a r1b"))
    val capped = run(docs, 900, cap = 3)
    assert(capped.map(p => (p._1, p._2)) == Seq(("r1", "r2")))
    val uncapped = run(docs, 900, cap = 0)
    assert(uncapped.map(p => (p._1, p._2)) ==
      Seq(("r1", "r2"), ("s1", "s2")))
    assert(uncapped == model(docs, 900))
  }

  test("NULL ids, NULL texts, and zero-token texts yield no rows; " +
    "permille domain enforced; no nested-loop join in the plan") {
    val docs = Seq((null: String, "x y"), ("n1", null: String),
      ("n2", "   "), ("n3", "x y"), ("n4", "x y"))
    assert(run(docs, 500) == Seq(("n3", "n4", 2L, 2L, 2L, 1.0)))
    intercept[IllegalArgumentException] { run(docs, 0) }
    intercept[IllegalArgumentException] { run(docs, 1001) }
    val plan = SetJoin.jaccardJoin(docs.toDF("doc_id", "text"), 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("prefix starvation of hot tokens: a doc with enough rare tokens " +
    "never emits its stopwords as join keys (layout-checked at " +
    "several partition counts)") {
    // every doc shares 'common'; each has 9 unique tokens. J between any
    // pair = 1/19 << t, and with t=500 the prefix is the 5 RAREST tokens
    // -> 'common' (df=20) is never a key -> zero candidates, zero pairs.
    val docs = (0 until 20).map { i =>
      (f"u$i%02d", ("common" +: (0 until 9).map(j => s"u${i}t$j")).mkString(" "))
    }
    for (p <- Seq(1, 7)) {
      val out = SetJoin.jaccardJoin(
        docs.toDF("doc_id", "text").repartition(p), 500)
      assert(out.isEmpty, s"parts=$p")
    }
  }

  private def runC(docs: Seq[(String, String)], permille: Int,
      cap: Int = SetJoin.DefaultMaxTokenDf) =
    SetJoin.containmentJoin(docs.toDF("doc_id", "text"), permille, cap)
      .as[(String, String, Long, Long, Long, Double)]
      .collect().toSeq.sortBy(p => (p._1, p._2))

  /** The naive all-ordered-pairs containment definition. */
  private def modelC(docs: Seq[(String, String)], permille: Int) = {
    val sets = docs.filter(d => d._1 != null && d._2 != null)
      .map { case (id, t) =>
        (id, t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet)
      }
      .filter(_._2.nonEmpty)
    for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b
      inter = (sa & sb).size.toLong
      if inter * 1000 >= permille * sa.size
    } yield (a, b, inter, sa.size.toLong, sb.size.toLong,
      inter.toDouble / sa.size.toDouble)
  }.sortBy(p => (p._1, p._2))

  test("containment: brute-force equivalence incl. asymmetry (the " +
    "excerpt-in-article pair Jaccard cannot see), both directions of " +
    "near-equal sets, and the exact boundary") {
    val docs = Seq(
      ("art", "alpha beta gamma delta epsilon zeta eta theta iota"),
      ("quote", "gamma delta epsilon"), // fully inside art: C=1.0
      ("near", "alpha beta gamma delta epsilon zeta eta theta"),
      ("half", "gamma delta kappa lambda"), // 2/4 = 0.5 in art
      ("other", "mu nu xi"))
    for (t <- Seq(400, 500, 900, 1000)) {
      assert(runC(docs, t) == modelC(docs, t), s"t=$t")
    }
    val at1000 = runC(docs, 1000)
    // quote ⊂ art AND ⊂ near; near ⊂ art; art ⊄ near (misses iota)
    assert(at1000.map(r => (r._1, r._2)) ==
      Seq(("near", "art"), ("quote", "art"), ("quote", "near")))
    // at 500 the half-overlap pair appears exactly at the boundary
    assert(runC(docs, 500).exists(r => r._1 == "half" && r._2 == "art"))
    assert(!runC(docs, 501).exists(r => r._1 == "half" && r._2 == "art"))
  }

  test("candidate-filter boundaries (round-6 length + positional " +
    "pruning): a pair exactly AT both integer bounds is kept") {
    // t = 0.5: x = {a,b}, y = {a,b,c,d} (as sets; c,d rarer than a,b).
    // LENGTH bound is tight: n_y*p = 4*500 = n_x*1000 = 2000.
    // x ⊂ y gives inter=2, J = 2/4 = 0.5 exactly.
    // POSITIONAL bound is tight too: global order (df asc, token asc)
    // is c,d,a,b; the pair's only colliding prefix key is 'a' at
    // positions i=1 (of x) and j=3 (of y): 1 + min(2-1, 4-3) = 2 =
    // ceil(p*(n_x+n_y)/(1000+p)). An off-by-one in either filter
    // drops this qualifying pair.
    val docs = Seq(("x", "a b"), ("y", "a b c d"))
    assert(run(docs, 500) == model(docs, 500) &&
      run(docs, 500).map(r => (r._1, r._2)) == Seq(("x", "y")))
    // and one unit above the threshold it must vanish
    assert(run(docs, 501).isEmpty)
    // containment flavor, same corpus: x ⊂ y, C(x in y) = 1.0; the
    // reverse direction C(y in x) = 2/4 = 0.5 sits exactly at t=500
    // (positional: first collision c at i=1 of y's 3-key prefix, j=...
    // c not in x — the qualifying collision is a at i=3, j=1:
    // 1 + min(4-3, 2-1) = 2 = ceil(500*4/1000)).
    assert(runC(docs, 500) == modelC(docs, 500))
    assert(runC(docs, 500).map(r => (r._1, r._2)).toSet ==
      Set(("x", "y"), ("y", "x")))
    assert(runC(docs, 501).map(r => (r._1, r._2)) == Seq(("x", "y")))
  }

  test("containment: random corpus equivalence across thresholds") {
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (0 until 60).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val n = 2 + (h % 9).toInt
      val words = (0 until n).map(j =>
        vocab(((h + j * 131) % vocab.size).toInt))
      (f"d$i%03d", words.mkString(" "))
    }
    for (t <- Seq(300, 700, 950))
      assert(runC(docs, t) == modelC(docs, t), s"t=$t")
  }
}
