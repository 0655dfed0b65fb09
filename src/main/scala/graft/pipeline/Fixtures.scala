package graft.pipeline

import graft.model.{IntelEntry, Turn}

import java.sql.Timestamp

/** Deterministic fixture synthesis (FIXTURES.md): multi-turn transcripts
  * with IoCs planted at controlled rates, plus two threat-intel feeds.
  * Pure functions of the row index — usable driver-side (tiny scale) and
  * distributed via spark.range (bench scale), never materialized to git.
  * No wall-clock, no external data (BASELINE.json input_hint).
  */
object Fixtures {

  // ------------------------------------------------------------- PRNG
  /** splitmix64 — tiny, public-domain PRNG; pure function of the seed. */
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // ------------------------------------------------------------ pools
  // Values that MATCH intel entries (db "threats") — see intel() below.
  private val matchingIpv4 = Array(
    "192.0.2.1", // /32 entry nested inside /24 (LPM pin)
    "192.0.2.77", // covered by 192.0.2.0/24
    "203.0.113.7", // /32 entry
    "10.10.99.5", // covered by 10.10.0.0/16
    "198.51.100.23" // covered by 198.51.100.0/24
  )
  private val cleanIpv4 = Array(
    "8.8.8.8", "1.1.1.1", "172.16.31.9", "100.64.7.3", "9.9.9.9")
  private val matchingIpv6 = Array(
    "2001:db8:bad:1::77", // covered by 2001:db8:bad::/48
    "2001:db8:bad::2")
  private val cleanIpv6 = Array("2607:f8b0::1a2b", "2a00:1450:4001::8a")
  private val matchingDomains = Array(
    "evil-domain.com", // literal
    "malware.badsite.org", // literal
    "host7.evil-glob.net", // *.evil-glob.net
    "mal3.example.com", // mal[0-9].example.com
    "my-c2-server.io", // *c2* (pure wildcard)
    "xx-paraglob-sub.com" // glob:paraglob-sub (pure literal => substring)
  )
  private val cleanDomains = Array(
    "github.com", "docs.example.com", "api.service.co.uk",
    "cdn.content.net", "mail.google.com", "maly.example.com")
  private val matchingEmails = Array("alice@evil-domain.com") // literal
  private val cleanEmails = Array("bob@github.com", "ops@service.co.uk")
  // hashes: stable hex strings (derived once from fixed text, hardcoded)
  private val matchingHashes = Array(
    "5d41402abc4b2a76b9719d911017c592", // md5("hello") — literal entry
    "2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae" // sha256("foo")
  )
  private val cleanHashes = Array(
    "9e107d9d372bb6826bd81d3542a419d6", // md5(quick brown fox)
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    "da39a3ee5e6b4b0d3255bfef95601890afd80709", // sha1("")
    "cf83e1357eefb8bdf1542850d66d8007d620e4050b5715dc83f4a921d36ce9ce47d0d13c5d85f2b0ff8318d2877eec2f63b931bd47417a81a538327af927da3e"
  )
  private val matchingBtc = Array(
    "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa") // literal entry
  private val cleanBtc = Array(
    "3J98t1WpEZ73CNmQviecrnyiWrnqRhWNLy",
    "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4")
  private val matchingEth = Array(
    "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed") // literal entry
  private val cleanEth = Array(
    "0xde709f2102306220921060314715629080e2fb77",
    "0x52908400098527886E0F7030069857D2E4169EE7")
  // negatives: must NOT extract (grammar violations per SURVEY.md §2.2)
  private val negatives = Array(
    "999.1.2.3", "192.168.01.5", "1.2.3.4.5", "256.256.256.256",
    "fe80::dead:beef", "::1", "2001:db8::", "bare.tld-not-real",
    "x..y@example.com", "12345@example.com", "user@nodots",
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b85",
    "1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNb",
    "0x5Aaeb6053F3E94C9b9A09f33669435E7Ef1BeAed")
  private val filler = Array(
    "the agent ran a tool call and inspected the output",
    "user asked about deployment logs for the service",
    "assistant summarized the scan results in detail",
    "connection established and handshake completed quickly",
    "retrying with exponential backoff after transient failure",
    "wrote checkpoint and advanced the offset marker",
    "parsed the response payload into structured fields",
    "no anomalies detected in the previous batch window")

  private def pick(arr: Array[String], r: Long): String =
    arr(((r >>> 33) % arr.length).toInt)

  /** Deterministic text of turn i: filler + 0..3 planted tokens.
    * Planting rates (per mille, FIXTURES.md §1, each figure the COMBINED
    * matching+clean total): ipv4 80, domains 120, emails 40, ipv6 20,
    * hashes 50, btc 12, eth 12, negatives 60.
    */
  def text(i: Long): String = {
    val sb = new StringBuilder(96)
    sb.append(pick(filler, mix(i * 31 + 7)))
    var slot = 0
    while (slot < 3) {
      val r = mix(i * 131 + slot * 17 + 1)
      val roll = ((r >>> 8) % 1000).toInt
      val token =
        if (roll < 40) pick(matchingIpv4, r)
        else if (roll < 80) pick(cleanIpv4, r)
        else if (roll < 140) pick(matchingDomains, r)
        else if (roll < 200) pick(cleanDomains, r)
        else if (roll < 220) pick(matchingEmails, r)
        else if (roll < 240) pick(cleanEmails, r)
        else if (roll < 250) pick(matchingIpv6, r)
        else if (roll < 260) pick(cleanIpv6, r)
        else if (roll < 285) pick(matchingHashes, r)
        else if (roll < 310) pick(cleanHashes, r)
        else if (roll < 316) pick(matchingBtc, r)
        else if (roll < 322) pick(cleanBtc, r)
        else if (roll < 328) pick(matchingEth, r)
        else if (roll < 334) pick(cleanEth, r)
        else if (roll < 394) pick(negatives, r)
        else null
      if (token != null) { sb.append(' ').append(token) }
      sb.append(' ').append(pick(filler, mix(i * 57 + slot * 23 + 11)))
      slot += 1
    }
    sb.toString
  }

  private val roles = Array("user", "assistant", "system", "tool")
  private val tools = Array("", "bash", "browser", "search")

  /** Row i -> Turn. Skew: conv-000000 holds ~1/16 of all turns (hot
    * conversation, exercises AQE/skew handling); the rest are spread over
    * conversations of ~24 turns.
    */
  /** Zero-padded conv id without java.util.Formatter (which is regex-based
    * and dominates row-generation cost at bench scale).
    */
  private def convId(conv: Long): String = {
    val d = conv.toString
    val sb = new java.lang.StringBuilder(13)
    sb.append("conv-")
    var pad = 6 - d.length
    while (pad > 0) { sb.append('0'); pad -= 1 }
    sb.append(d).toString
  }

  def turn(i: Long, totalRows: Long): Turn = {
    val hotRows = math.max(1L, totalRows / 16)
    // turn_idx is an Int per the input-table contract; a hot conversation
    // beyond 2^31 turns would overflow into NEGATIVE, colliding
    // (conv_id, turn_idx) keys and corrupting every distinct-turn count.
    // Fail loudly instead of silently truncating (the generator caps at
    // ~34e9 rows; segment the hot conversation if a larger fixture is
    // ever needed).
    require(hotRows <= Int.MaxValue,
      s"fixture hot conversation would overflow Int turn_idx " +
        s"(totalRows=$totalRows -> hotRows=$hotRows > 2^31-1)")
    val (conv, turnIdx) =
      if (i < hotRows) (0L, i)
      else {
        val j = i - hotRows
        (1L + j / 24, j % 24)
      }
    Turn(
      conv_id = convId(conv),
      turn_idx = turnIdx.toInt,
      role = roles(((mix(i * 11 + 3) >>> 16) % 4).toInt),
      text = text(i),
      tool = tools(((mix(i * 13 + 5) >>> 16) % 4).toInt),
      ts = new Timestamp(1700000000000L + i * 1000L)
    )
  }

  def turns(n: Long): Seq[Turn] =
    (0L until n).map(i => turn(i, n))

  /** Primary intel feed (db "threats") — covers every entry class:
    * nested CIDRs (LPM pin), /32 and /128, literals, suffix/prefix/charclass
    * globs, pure wildcard, forced-prefix entries (FIXTURES.md §2).
    */
  val intelThreats: Seq[IntelEntry] = Seq(
    IntelEntry("192.0.2.0/24", "high", "c2", "feed-a", 90),
    IntelEntry("192.0.2.1", "critical", "c2", "feed-a", 99),
    IntelEntry("203.0.113.7", "medium", "scanner", "feed-a", 70),
    IntelEntry("10.10.0.0/16", "low", "internal-test", "feed-b", 50),
    IntelEntry("198.51.100.0/24", "high", "malware", "feed-b", 85),
    IntelEntry("2001:db8:bad::/48", "high", "c2", "feed-a", 88),
    IntelEntry("2001:db8:bad::2", "critical", "c2", "feed-a", 97),
    IntelEntry("evil-domain.com", "critical", "phishing", "feed-a", 95),
    IntelEntry("malware.badsite.org", "high", "malware", "feed-b", 90),
    IntelEntry("alice@evil-domain.com", "high", "phishing", "feed-a", 92),
    IntelEntry("5d41402abc4b2a76b9719d911017c592", "medium", "malware",
      "feed-b", 75),
    IntelEntry("2c26b46b68ffc68ff99b453c1d30413413422d706483bfa0f98a5e886266e7ae",
      "high", "malware", "feed-b", 80),
    IntelEntry("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa", "medium", "ransomware",
      "feed-a", 77),
    IntelEntry("0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed", "medium",
      "ransomware", "feed-a", 76),
    IntelEntry("*.evil-glob.net", "high", "c2", "feed-a", 85),
    IntelEntry("mal[0-9].example.com", "medium", "malware", "feed-b", 72),
    IntelEntry("*c2*", "low", "heuristic", "feed-b", 40),
    IntelEntry("glob:paraglob-sub", "low", "heuristic", "feed-b", 45),
    IntelEntry("literal:*.not-a-glob.com", "low", "test", "feed-b", 30),
    IntelEntry("error-*", "low", "heuristic", "feed-b", 35)
  )

  /** Secondary feed (db "allowlist") — multi-database fan-out (L8). */
  val intelAllowlist: Seq[IntelEntry] = Seq(
    IntelEntry("8.8.8.8", "unknown", "allowlist", "corp", 100),
    IntelEntry("github.com", "unknown", "allowlist", "corp", 100),
    IntelEntry("*.google.com", "unknown", "allowlist", "corp", 100),
    IntelEntry("10.10.0.0/16", "unknown", "allowlist", "corp", 60)
  )
}
