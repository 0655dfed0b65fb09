package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conversation-level rollups: stats, ordered reconstruction, exact dedup. */
class ConversationsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // out-of-order turn rows on purpose: ordering must come from turn_idx
  private lazy val turns = Seq(
    ("c1", 1, "assistant", "hi there", "", ts(2000)),
    ("c1", 0, "user", "hello", "", ts(1000)),
    ("c1", 2, "user", "bye", "", ts(3500)),
    ("c2", 0, "user", "hello", "", ts(5000))
  ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("stats: counts, span in exact micros, order-stable fingerprint") {
    val r = Conversations.stats(turns).orderBy("conv_id").collect()
    val c1 = r(0)
    assert(c1.getAs[String]("conv_id") == "c1")
    assert(c1.getAs[Long]("n_turns") == 3L)
    assert(c1.getAs[Long]("n_roles") == 2L)
    assert(c1.getAs[Long]("n_chars") == ("hello" + "hi there" + "bye").length)
    assert(c1.getAs[Long]("span_us") == 2500L * 1000)
    // fingerprint is over turn_idx order, not row order
    val shuffled = turns.orderBy(rand(7))
    assert(Conversations.stats(shuffled).orderBy("conv_id").collect()
      .map(_.getAs[String]("fp")).toSeq ==
      r.map(_.getAs[String]("fp")).toSeq)
  }

  test("transcriptText reconstructs role-prefixed lines in turn order") {
    val m = Conversations.transcriptText(turns).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("c1") == "user: hello\nassistant: hi there\nuser: bye")
    assert(m("c2") == "user: hello")
  }

  test("fingerprint is injective across turn boundaries: a text embedding " +
    "'\\nrole: ' must not collide with two separate turns") {
    // conversation A: ONE turn whose text contains what the naive
    // "role: text\n" serialization would render as a turn boundary
    val a = Seq(("a", 0, "user", "hello\nassistant: hi there", "", ts(1000)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    // conversation B: TWO genuine turns with the same naive serialization
    val b = Seq(
      ("b", 0, "user", "hello", "", ts(1000)),
      ("b", 1, "assistant", "hi there", "", ts(2000))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val fps = Conversations.fingerprints(a.unionByName(b))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") != fps("b"))
    // and dedupExact keeps them as two distinct conversations (no data loss)
    assert(Conversations.dedupExact(a.unionByName(b)).count() == 2)
  }

  test("fingerprint distinguishes null-field turns: [(u,hi),(a,NULL)] is " +
    "NOT the same conversation as [(u,hi)], and null != empty string") {
    // null text: md5(null) is null and concat_ws SKIPS null elements, so
    // without the null filler the second turn would contribute nothing
    val a = Seq(
      ("a", 0, "user", "hi", "", ts(1000)),
      ("a", 1, "assistant", null.asInstanceOf[String], "", ts(2000))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val b = Seq(("b", 0, "user", "hi", "", ts(1000)))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    // c: like a, but the second turn's text is EMPTY, not null
    val c = Seq(
      ("c", 0, "user", "hi", "", ts(1000)),
      ("c", 1, "assistant", "", "", ts(2000))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val all = a.unionByName(b).unionByName(c)
    val fps = Conversations.fingerprints(all)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("a") != fps("b"), "null-text turn was silently dropped")
    assert(fps("a") != fps("c"), "null text collided with empty text")
    assert(Conversations.dedupExact(all).count() == 3)
  }

  test("dedupExact collapses identical conversations onto min conv_id") {
    val dup = turns.where($"conv_id" === "c1")
      .withColumn("conv_id", lit("z-copy"))
      // different timestamps must NOT defeat text-identity dedup
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
    val out = Conversations.dedupExact(turns.unionByName(dup))
      .orderBy("canonical_conv_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("canonical_conv_id") == "c1")
    assert(out(0).getAs[Long]("n_convs") == 2L)
    assert(out(1).getAs[String]("canonical_conv_id") == "c2")
    assert(out(1).getAs[Long]("n_convs") == 1L)
  }

  test("transcriptText renders null-field turns instead of dropping them " +
    "(round-5 find)") {
    val turns = Seq(
      ("c1", 0, "user", "hi", "", "2024-01-01T00:00:00Z"),
      ("c1", 1, "assistant", null, "", "2024-01-01T00:00:01Z")
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val t = Conversations.transcriptText(turns).collect().head.getString(1)
    assert(t == "user: hi\nassistant: ",
      s"null-text turn must stay in the transcript, got: $t")
  }

}
