package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: the `spark.sql.extensions=graft.GraftExtensions`
  * path. Spark's extension machinery calls `injectFunction` per description
  * and later replays each into the session's FunctionRegistry; the suite
  * applies the same descriptions to a fresh `newSession` registry (one
  * shared SparkContext per test JVM, so a second extension-built session
  * can't be constructed here) and then exercises every function through
  * `spark.sql`, which is the part the extension exists to enable.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension class applies cleanly to SparkSessionExtensions") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("descriptions register and run through spark.sql") {
    val spark = SparkTestBase.spark.newSession()
    GraftExtensions.descriptions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

    val iocs = spark.sql(
      """SELECT x.indicator_type, x.value
        |FROM (SELECT explode(extract_iocs('conn from 10.1.2.3 to evil.com')) x)
        |ORDER BY 1""".stripMargin).collect()
    assert(iocs.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("domain", "evil.com"), ("ipv4", "10.1.2.3")))

    val red = spark.sql(
      "SELECT redact_iocs('peer 10.1.2.3 called evil.com now')")
      .collect().head.getString(0)
    assert(red == "peer [REDACTED:ipv4] called [REDACTED:domain] now")

    val ref = spark.sql(
      "SELECT refang_text('see hxxp://bad[.]example[.]com')")
      .collect().head.getString(0)
    assert(ref == "see http://bad.example.com")

    val grok = spark.sql(
      """SELECT g[0] AS lvl, g[1] AS usr FROM (SELECT
        |  grok_parse('INFO user=42', '%{LOGLEVEL:level} user=%{INT:user}')
        |    AS g)""".stripMargin).collect().head
    assert((grok.getString(0), grok.getString(1)) == (("INFO", "42")))
    assert(spark.sql(
      "SELECT grok_parse('garbage', '%{LOGLEVEL:l} user=%{INT:u}')")
      .collect().head.isNullAt(0), "non-matching line must yield NULL")

    // a fresh newSession must NOT see the temp registrations (isolation)
    val other = SparkTestBase.spark.newSession()
    intercept[Exception] {
      other.sql("SELECT refang_text('x')").collect()
    }
  }

  test("grok_parse: pattern must be a foldable string literal and a " +
    "known vocabulary — all analysis-time errors, arity checked") {
    val spark = SparkTestBase.spark.newSession()
    graft.functions.GraftFunctions.register(spark)
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT grok_parse('a', concat('x', rand()))").collect()
    }
    assert(nonFoldable.getCondition == "NON_FOLDABLE_ARGUMENT",
      nonFoldable.getMessage)
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT grok_parse('a')").collect()
    }
    assert(arity.getCondition != null &&
      arity.getCondition.startsWith("WRONG_NUM_ARGS"))
    // a foldable non-string is a TYPE error, not a foldability error
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT grok_parse('a', 42)").collect()
    }
    assert(wrongType.getCondition == "DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE",
      wrongType.getMessage)
    // unknown %{NAME} comes from GrokParse's constructor-time compile
    intercept[IllegalArgumentException] {
      spark.sql("SELECT grok_parse('a', '%{NOPE:x}')").collect()
    }
  }

  test("wrong arity is a clean analysis error naming the function") {
    val spark = SparkTestBase.spark.newSession()
    GraftExtensions.descriptions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val zero = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT extract_iocs()").collect()
    }
    assert(zero.getMessage.contains("extract_iocs"))
    assert(zero.getCondition != null &&
      zero.getCondition.startsWith("WRONG_NUM_ARGS"))
    // extra arguments are rejected, not silently ignored
    val two = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT redact_iocs('a', 'b')").collect()
    }
    assert(two.getMessage.contains("redact_iocs"))
  }

  test("GraftFunctions.register shares the arity-checked builders, and " +
      "non-string args implicit-cast instead of crashing at runtime") {
    val spark = SparkTestBase.spark.newSession()
    graft.functions.GraftFunctions.register(spark)
    // zero args: the same clean WRONG_NUM_ARGS analysis error as the
    // extension path (previously a NoSuchElementException from exprs.head)
    val zero = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT extract_iocs()").collect()
    }
    assert(zero.getCondition != null &&
      zero.getCondition.startsWith("WRONG_NUM_ARGS"))
    // extra args: rejected, not silently ignored
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT refang_text('a', 'b')").collect()
    }
    // ImplicitCastInputTypes: an int argument casts to string at analysis
    // time and the scan runs (previously a mid-job ClassCastException)
    val n = spark.sql("SELECT size(extract_iocs(12345))")
      .collect().head.getInt(0)
    assert(n == 0) // "12345" holds no indicators — but it RAN
  }
}
