package graft.ops

import graft.SparkTestBase
import graft.functions.GrokParse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GrokParse / LogParse — grok compilation, parse semantics, and the
  * one-match-per-row guarantee.
  */
class GrokParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Pat =
    "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} user=%{INT:user} " +
      "msg=%{QUOTEDSTRING:msg}"

  test("compile: fields in order, literals escaped, %{X} non-capturing") {
    val c = GrokParse.compile("a.b %{INT:n} %{WORD} end%{GREEDYDATA:rest}")
    assert(c.fields == Seq("n", "rest"))
    assert(c.regex.startsWith("^a\\.b "))
    assert(c.regex.contains("(?:\\w+)")) // unnamed token captures nothing
    assert(c.regex.endsWith("$"))
  }

  test("compile rejects unknown patterns, zero fields, duplicate fields") {
    intercept[IllegalArgumentException](GrokParse.compile("%{NOPE:x}"))
    intercept[IllegalArgumentException](GrokParse.compile("plain text"))
    intercept[IllegalArgumentException](
      GrokParse.compile("%{INT:x} %{INT:x}"))
  }

  test("compile rejects MALFORMED %{...} tokens loudly instead of " +
    "treating them as literal text that can never match") {
    // dotted field names, type suffixes, unclosed braces — all outside
    // the supported grammar; silently escaping them would dead-letter
    // 100% of input with no error anywhere
    intercept[IllegalArgumentException](
      GrokParse.compile("%{WORD:level} %{IPV4:client.ip}"))
    intercept[IllegalArgumentException](
      GrokParse.compile("%{INT:n:int} %{WORD:w}"))
    intercept[IllegalArgumentException](
      GrokParse.compile("%{INT:n %{WORD:w}"))
  }

  test("a grok field may shadow the input text column without corrupting " +
    "later fields (the staged-array fix)") {
    val df = Seq("foo 42").toDF("msg")
    val got = LogParse.parse(df, "msg", "%{WORD:msg} %{INT:code}")
      .select("msg", "code", "_grok_matched")
      .as[(String, String, Boolean)].collect().toSeq
    assert(got == Seq(("foo", "42", true)))
  }

  test("reserved field names are rejected") {
    val df = Seq("x").toDF("line")
    intercept[IllegalArgumentException](
      LogParse.parse(df, "line", "%{WORD:_grok_matched}"))
    intercept[IllegalArgumentException](
      LogParse.parse(df, "line", "%{WORD:__graft_x}"))
  }

  test("parse: matching lines splay into columns; garbage lines get " +
    "NULL fields and _grok_matched=false, never an exception") {
    val df = Seq(
      "2024-01-01T00:00:07 INFO user=8 msg=\"evt 0\"",
      "2024-02-03 10:20:30.5 WARN user=-12 msg=\"\"",
      "totally unparseable garbage",
      "2024-01-01T00:00:07 NOTALEVEL user=8 msg=\"x\""
    ).toDF("line")
    val got = LogParse.parse(df, "line", Pat)
      .select("ts", "level", "user", "msg", "_grok_matched")
      .as[(String, String, String, String, Boolean)].collect().toSeq
    assert(got(0) == (("2024-01-01T00:00:07", "INFO", "8", "\"evt 0\"", true)))
    assert(got(1) == (("2024-02-03 10:20:30.5", "WARN", "-12", "\"\"", true)))
    assert(got(2) == ((null, null, null, null, false)))
    assert(got(3) == ((null, null, null, null, false)))
  }

  test("null input text yields null array (and null fields)") {
    val df = Seq(Some("2024-01-01T00:00:07 INFO user=8 msg=\"a\""), None)
      .toDF("line")
    val got = LogParse.parse(df, "line", Pat)
      .select("level", "_grok_matched").as[(String, Boolean)]
      .collect().toSeq
    assert(got == Seq(("INFO", true), (null, false)))
  }

  test("one regex match per ROW, not per field: codegen subexpression " +
    "elimination collapses the per-field projections") {
    val n = 64
    val df = spark.range(n)
      .select(concat(lit("2024-01-01T00:00:07 INFO user="), $"id",
        lit(" msg=\"m\"")).as("line"))
    val q = LogParse.parse(df, "line", Pat)
      .select("ts", "level", "user", "msg", "_grok_matched")
    val before = GrokParse.invocations.sum()
    val rows = q.collect()
    val calls = GrokParse.invocations.sum() - before
    assert(rows.length == n)
    // 5 projected columns read the array; CSE must keep it ONE match per
    // row (allow a small constant slop for plan-probe evaluations)
    assert(calls <= n + 4, s"expected ~$n grok matches, saw $calls — " +
      "per-field re-evaluation has crept in")
  }

  test("stays map-side: no exchange in the parse plan") {
    val df = Seq("x").toDF("line")
    val plan = LogParse.parse(df, "line", Pat)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
