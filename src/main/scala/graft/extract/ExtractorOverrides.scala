package graft.extract

/** CLI extractor overrides (`--extractors`), mirroring the reference's
  * ExtractorConfig (bin/match_processor/parallel.rs:13-78):
  *
  *  - a comma list of names; a leading `-` disables a name;
  *  - group aliases: `crypto` = bitcoin+ethereum+monero, `ip`/`ips` =
  *    ipv4+ipv6; plural forms `domains`/`emails`/`hashes` normalize;
  *  - ANY positive name switches to EXCLUSIVE mode: capability-derived
  *    defaults are dropped and only the named extractors run
  *    (match_cmd.rs:284-303);
  *  - negative-only lists subtract from the defaults.
  *
  * Deliberate deviation: unknown names are an error here — the reference
  * silently carries them (parallel.rs:66), so a typo'd positive name like
  * `--extractors=domian` disables every extractor with no diagnostic.
  */
final case class ExtractorOverrides(
    overrides: Map[String, Boolean],
    hasEnables: Boolean
) {
  /** Resolve against capability-derived defaults: enabled(name) =
    * override if present, else (no explicit enables) && capability default
    * (match_cmd.rs:277-303).
    */
  def resolve(cap: ScanConfig): ScanConfig = {
    def en(name: String, capOn: Boolean): Boolean =
      overrides.getOrElse(name, !hasEnables && capOn)
    cap.copy(
      domains = en("domain", cap.domains),
      emails = en("email", cap.emails),
      ipv4 = en("ipv4", cap.ipv4),
      ipv6 = en("ipv6", cap.ipv6),
      hashes = en("hash", cap.hashes),
      bitcoin = en("bitcoin", cap.bitcoin),
      ethereum = en("ethereum", cap.ethereum),
      monero = en("monero", cap.monero))
  }
}

object ExtractorOverrides {

  val None: ExtractorOverrides = ExtractorOverrides(Map.empty, false)

  private val Known = Set("ipv4", "ipv6", "domain", "email", "hash",
    "bitcoin", "ethereum", "monero")

  /** parallel.rs:54-66 alias table. */
  private def expandAlias(name: String): Seq[String] = name match {
    case "crypto" => Seq("bitcoin", "ethereum", "monero")
    case "ip" | "ips" => Seq("ipv4", "ipv6")
    case "domains" => Seq("domain")
    case "emails" => Seq("email")
    case "hashes" => Seq("hash")
    case other => Seq(other)
  }

  def parse(arg: Option[String]): ExtractorOverrides = arg match {
    case scala.None => None
    case Some(s) =>
      var hasEnables = false
      val overrides = scala.collection.mutable.Map[String, Boolean]()
      s.split(',').map(_.trim).filter(_.nonEmpty).foreach { tok =>
        val (disable, name) =
          if (tok.startsWith("-")) (true, tok.drop(1)) else (false, tok)
        if (!disable) hasEnables = true
        val names = expandAlias(name)
        val unknown = names.filterNot(Known)
        require(unknown.isEmpty,
          s"unknown --extractors name(s): ${unknown.mkString(",")} " +
            s"(known: ${Known.toSeq.sorted.mkString(",")} + aliases " +
            "crypto/ip/ips/domains/emails/hashes)")
        names.foreach(n => overrides(n) = !disable)
      }
      ExtractorOverrides(overrides.toMap, hasEnables)
  }
}
