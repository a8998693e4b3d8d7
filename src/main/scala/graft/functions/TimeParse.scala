package graft.functions

import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter
import scala.util.Try

/** Duration / timestamp parsing with the reference's semantics (web.rs:35-141).
  *
  * Durations: either a plain float (seconds) or a concatenation of
  * `<int><unit>` parts with units ms|s|m|h|d|w|y, e.g. "1h2m1s500ms" = 3721.5.
  * Timestamps: either a float epoch or an RFC3339 string (millisecond
  * precision, like the reference's `timestamp_millis() / 1000.0`).
  */
object TimeParse {
  private val Part = "^(\\d+)(ms|s|m|h|d|w|y)".r

  private val unitSeconds: Map[String, Double] = Map(
    "ms" -> 0.001, "s" -> 1.0, "m" -> 60.0, "h" -> 3600.0,
    "d" -> 86400.0, "w" -> 604800.0, "y" -> 3600.0 * 24 * 365)

  /** Parse one `<num><unit>` prefix; returns (seconds, chars consumed). */
  private def parsePartial(s: String): Either[String, (Double, Int)] =
    Part.findFirstMatchIn(s) match {
      case None => Left(s"Cannot find num + unit in '$s'")
      case Some(m) =>
        val n = m.group(1).toLong.toDouble
        Right((n * unitSeconds(m.group(2)), m.end))
    }

  /** Java's Double.parseDouble accepts "1d"/"1f" suffixes that Rust's
    * f64::from_str (and hence the reference) rejects — gate on shape first. */
  private val PlainFloat = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$".r

  def parseDuration(value: String): Either[String, Double] = {
    val v = value.trim
    if (v.isEmpty) return Left("empty string")
    PlainFloat.findFirstIn(v).flatMap(s => Try(s.toDouble).toOption) match {
      case Some(d) => Right(d)
      case None =>
        var rest = v
        var total = 0.0
        while (rest.nonEmpty) {
          parsePartial(rest) match {
            case Left(err) => return Left(err)
            case Right((secs, consumed)) =>
              total += secs
              rest = rest.substring(consumed)
          }
        }
        Right(total)
    }
  }

  def parseDurationOrThrow(value: String): Double =
    parseDuration(value).fold(e => throw new IllegalArgumentException(e), identity)

  /** Epoch float or RFC3339 → epoch seconds (millisecond precision for RFC3339). */
  def parseTimestamp(value: String): Either[String, Double] = {
    val v = value.trim
    Try(v.toDouble).toOption match {
      case Some(d) => Right(d)
      case None =>
        Try(OffsetDateTime.parse(v, DateTimeFormatter.ISO_OFFSET_DATE_TIME)).toOption match {
          case Some(t) => Right(t.toInstant.toEpochMilli.toDouble / 1000.0)
          case None => Left(s"Cannot parse time: '$v'")
        }
    }
  }
}
