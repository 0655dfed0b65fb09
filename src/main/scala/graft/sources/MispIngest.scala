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
        val toIds = Option(a.get("to_ids"))
          .filter(n => n.isBoolean || n.isTextual || n.isNumber)
          .map(_.asBoolean(false))
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
            val parts = value.split('|')
            if (parts.length == 2) { add(parts(0)); add(parts(1)) }
          case "email" | "email-src" | "email-dst" | "email-reply-to" =>
            add(value)
          case _ => // unsupported attribute types skipped
        }
      }
    }
    out.toSeq
  }

  /** Domain portion of a URL: strip scheme, cut at first / ? # : */
  def domainFromUrl(url: String): Option[String] = {
    val trimmed = url.trim
    val noProto = {
      val i = trimmed.indexOf("://")
      if (i >= 0) trimmed.substring(i + 3) else trimmed
    }
    val end = noProto.indexWhere(c => c == '/' || c == '?' || c == '#' ||
      c == ':')
    val domain = if (end >= 0) noProto.substring(0, end) else noProto
    if (domain.nonEmpty) Some(domain) else None
  }

  def readFile(path: String): Seq[IntelEntry] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
