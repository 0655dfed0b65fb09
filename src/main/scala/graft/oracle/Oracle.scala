package graft.oracle

import graft.extract.IocScanner
import graft.intel.IntelDb
import graft.model.{IndicatorType => T, Candidate, Matched, Turn}

/** Single-threaded driver-side reference implementation of the full
  * scan -> extract -> lookup -> filter dataflow (SURVEY.md §7.1.6): the
  * stand-in for the Rust reference when pinning gold fixtures. Deliberately
  * simple (plain Scala collections, no Spark) — the distributed pipeline's
  * outputs must equal this exactly on the same input.
  */
object Oracle {

  def candidates(turns: Seq[Turn], scanner: IocScanner = IocScanner.default)
      : Seq[Candidate] =
    turns.flatMap { t =>
      scanner.scanText(t.text).map { m =>
        Candidate(t.conv_id, t.turn_idx, t.role, m.indicator_type, m.value,
          m.matched_text, m.span_start, m.span_end)
      }
    }

  def matched(turns: Seq[Turn], dbs: Seq[IntelDb],
      scanner: IocScanner = IocScanner.default): Seq[Matched] =
    candidates(turns, scanner).flatMap { c =>
      dbs.flatMap { db =>
        val isIp = c.indicator_type == T.Ipv4 || c.indicator_type == T.Ipv6
        if (isIp) {
          val hit = db.lookupIp(c.value, isV6 = c.indicator_type == T.Ipv6)
          if (hit == null) Nil
          else {
            val m = db.entries(hit._1)
            Seq(Matched(c.conv_id, c.turn_idx, c.role, c.indicator_type,
              c.value, c.matched_text, c.span_start, c.span_end,
              db.databaseId, "ip", hit._2, hit._1, m.threatLevel, m.category,
              m.source, m.confidence))
          }
        } else {
          db.lookupString(c.value).toSeq.map { idx =>
            val m = db.entries(idx)
            Matched(c.conv_id, c.turn_idx, c.role, c.indicator_type, c.value,
              c.matched_text, c.span_start, c.span_end, db.databaseId,
              "pattern", -1, idx, m.threatLevel, m.category, m.source,
              m.confidence)
          }
        }
      }
    }

  /** A10 gold counts: (database_id, indicator_type, role) -> count. */
  def goldCounts(turns: Seq[Turn], dbs: Seq[IntelDb])
      : Map[(String, String, String), Long] =
    matched(turns, dbs)
      .groupBy(m => (m.database_id, m.indicator_type, m.role))
      .map { case (k, v) => k -> v.size.toLong }

  /** A1-A6 stats vector. `scanner` must mirror the pipeline's extractor
    * configuration (ScanJob derives capability defaults from the dbs —
    * pass `new IocScanner(ScanJob.capabilityConfig(dbs))` to compare
    * against a capability-defaulted run; the default full scanner matches
    * a run with every extractor on).
    */
  def stats(turns: Seq[Turn], dbs: Seq[IntelDb],
      scanner: IocScanner = IocScanner.default): Map[String, Long] = {
    val cands = candidates(turns, scanner)
    val m = matched(turns, dbs, scanner)
    Map(
      "lines_processed" -> turns.size.toLong,
      "total_bytes" -> turns.map(_.text.getBytes("UTF-8").length.toLong).sum,
      "candidates_tested" -> cands.size.toLong,
      "total_matches" -> m.size.toLong,
      "lines_with_matches" ->
        m.map(x => (x.conv_id, x.turn_idx)).distinct.size.toLong
    ) ++ cands.groupBy(_.indicator_type).map { case (k, v) =>
      s"candidates_$k" -> v.size.toLong
    }
  }
}
