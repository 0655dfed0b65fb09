package graft.sources

import graft.model.IntelEntry
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** MISP JSON intel source (S8, reference matchy/src/misp_importer.rs):
  * traverses Event-level and Object-embedded attributes and maps actionable
  * attribute types to intel entries:
  *  - ip-src / ip-dst / ip            -> IP entry
  *  - ip-src/netmask, ip-dst/netmask  -> CIDR entry
  *  - ip-src|port, ip-dst|port        -> IP (port stripped)
  *  - domain / hostname               -> literal
  *  - domain|ip                       -> both (domain literal + IP)
  *  - url / uri                       -> domain (scheme/path stripped) + URL
  *  - md5/sha1/sha256/sha384/sha512   -> literal
  *  - filename|<hash>                 -> both literals
  *  - email / email-src / email-dst / email-reply-to -> literal
  * Event threat_level_id: 1=high, 2=medium, 3=low, else unknown.
  *
  * Driver-side parsing (jackson, bundled with Spark) — intel feeds are the
  * small broadcast side of the pipeline.
  */
object MispIngest {

  private val hashTypes = Set("md5", "sha1", "sha224", "sha256", "sha384",
    "sha512", "sha512/224", "sha512/256", "sha3-256", "ssdeep", "imphash")

  def parse(json: String): Seq[IntelEntry] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    val events: Seq[JsonNode] =
      if (root.has("response") && root.get("response").isArray)
        root.get("response").elements().asScala.toSeq
          .flatMap(n => Option(n.get("Event")))
      else if (root.has("Event")) Seq(root.get("Event"))
      else if (root.isArray)
        root.elements().asScala.toSeq.flatMap(n => Option(n.get("Event")))
      else Seq.empty

    val out = new ArrayBuffer[IntelEntry]
    events.foreach { ev =>
      val threatLevel = Option(ev.get("threat_level_id"))
        .map(_.asText()).getOrElse("") match {
        case "1" => "high"
        case "2" => "medium"
        case "3" => "low"
        case _   => "unknown"
      }
      val source = Option(ev.get("info")).map(_.asText("misp"))
        .getOrElse("misp")
      def tagNames(node: JsonNode): Seq[String] =
        Option(node.get("Tag")).filter(_.isArray)
          .map(_.elements().asScala.toSeq
            .flatMap(t => Option(t.get("name")).map(_.asText()))
            .filter(_.nonEmpty))
          .getOrElse(Nil)
      val eventTags = tagNames(ev)
      def attrs(node: JsonNode): Seq[JsonNode] =
        Option(node.get("Attribute")).filter(_.isArray)
          .map(_.elements().asScala.toSeq).getOrElse(Nil)
      val objAttrs = Option(ev.get("Object")).filter(_.isArray)
        .map(_.elements().asScala.toSeq.flatMap(attrs)).getOrElse(Nil)
      (attrs(ev) ++ objAttrs).foreach { a =>
        val atype = Option(a.get("type")).map(_.asText()).getOrElse("")
        val value = Option(a.get("value")).map(_.asText()).getOrElse("")
        val category = Option(a.get("category")).map(_.asText())
          .filter(_.nonEmpty).getOrElse("unknown")
        // attribute metadata fidelity (reference misp_importer.rs:884-925):
        // to_ids actionability bit, analyst comment, unix timestamp, and
        // event tags merged with attribute tags (event first, like the
        // reference's base_metadata + attribute-tag append)
        // string-boolean exports ("1"/"0") must not collapse to false:
        // Jackson's TextNode.asBoolean parses only "true"/"false", so "1"
        // would be recorded as explicitly non-actionable and a to_ids=true
        // filter would drop every actionable indicator of such a feed
        val toIds = Option(a.get("to_ids")).flatMap { n =>
          if (n.isBoolean) Some(n.asBoolean())
          else if (n.isNumber) Some(n.asInt() != 0)
          else if (n.isTextual) n.asText().trim.toLowerCase(java.util.Locale.ROOT) match {
            case "1" | "true"  => Some(true)
            case "0" | "false" => Some(false)
            case _             => None
          }
          else None
        }
        val comment = Option(a.get("comment")).map(_.asText())
          .filter(_.nonEmpty).getOrElse("")
        val ts = Option(a.get("timestamp")).map(_.asLong(-1L)).getOrElse(-1L)
        val tags = (eventTags ++ tagNames(a)).mkString(",")
        // MISP has no standard confidence; honor an explicit numeric
        // `confidence` field when an export carries one, else 0
        val conf = Option(a.get("confidence")).map(_.asInt(0)).getOrElse(0)
        def add(entry: String): Unit =
          if (entry.nonEmpty)
            out += IntelEntry(entry, threatLevel, category, source, conf,
              to_ids = toIds, comment = comment, attr_type = atype,
              attr_timestamp = ts, tags = tags)
        atype match {
          case "ip-src" | "ip-dst" | "ip" => add(value)
          case "ip-src/netmask" | "ip-dst/netmask" => add(value)
          case "ip-src|port" | "ip-dst|port" =>
            add(value.split('|').head)
          case "domain" | "hostname" => add(value)
          case "domain|ip" =>
            val parts = value.split('|')
            if (parts.length == 2) { add(parts(0)); add(parts(1)) }
          case "url" | "uri" =>
            domainFromUrl(value).foreach(add)
            add(value)
          case t if hashTypes.contains(t) => add(value)
          case t if t.startsWith("filename|") =>
            // split at the LAST '|': the hash is always the final
            // component, and a filename may itself contain '|' — the old
            // exactly-2-parts guard dropped BOTH entries for such values
            val cut = value.lastIndexOf('|')
            if (cut > 0 && cut < value.length - 1) {
              add(value.substring(0, cut)); add(value.substring(cut + 1))
            }
          case "email" | "email-src" | "email-dst" | "email-reply-to" =>
            add(value)
          case _ => // unsupported attribute types skipped
        }
      }
    }
    out.toSeq
  }

  /** Host portion of a URL: strip scheme, cut the authority at the first
    * / ? #, drop userinfo (…@), then strip the port — honoring IPv6
    * bracket literals (`http://[2001:db8::1]:8080/x` yields 2001:db8::1,
    * which classifies as an ip entry; the old first-':' cut emitted the
    * garbage literal "[2001" and `user:pass@host` URLs emitted "user").
    */
  def domainFromUrl(url: String): Option[String] = {
    val trimmed = url.trim
    val noProto = {
      val i = trimmed.indexOf("://")
      if (i >= 0) trimmed.substring(i + 3) else trimmed
    }
    val authEnd = noProto.indexWhere(c => c == '/' || c == '?' || c == '#')
    val auth = if (authEnd >= 0) noProto.substring(0, authEnd) else noProto
    val at = auth.lastIndexOf('@')
    val hostPort = if (at >= 0) auth.substring(at + 1) else auth
    val host =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close > 1) hostPort.substring(1, close) else ""
      } else {
        val colon = hostPort.indexOf(':')
        if (colon >= 0) hostPort.substring(0, colon) else hostPort
      }
    if (host.nonEmpty) Some(host) else None
  }

  def readFile(path: String): Seq[IntelEntry] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
