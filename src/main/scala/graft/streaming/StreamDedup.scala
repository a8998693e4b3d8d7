package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: first-seen filter on normalized content
  * hash, as a stateful Structured Streaming operator — the continuous-ingest
  * counterpart of [[graft.llm.Dedup.exact]] for a crawl that arrives as a
  * stream rather than a snapshot.
  *
  * State design for scale: the per-key state is a single boolean ("seen"),
  * so the state store grows with DISTINCT content hashes only — the minimum
  * any exact-dedup can hold — and is hash-partitioned across executors by
  * the same key the batch operator shuffles on. For unbounded crawls, pass
  * `ttl` to age out hashes not seen for that long (trades storage for
  * accepting re-crawled content after the window; Prometheus of choices for
  * a real pipeline: bounded state beats unbounded growth).
  *
  * Within one micro-batch the keeper is the smallest doc_id of the group —
  * the same deterministic keep-first rule as the batch operator, so a
  * one-batch stream reproduces `Dedup.exact`'s keeper set exactly (proven
  * by StreamingSpec).
  */
object StreamDedup {

  // public: Catalyst's generated (de)serializers need member access
  final case class DocKey(doc_id: Long, h: String)
  final case class Kept(doc_id: Long, h: String)

  /** `docs` must be a streaming DataFrame with `doc_id` (long) and `text`
    * (string) columns. Emits one row per first-seen normalized text. */
  def streaming(spark: SparkSession, docs: DataFrame,
                ttl: Option[String] = None): Dataset[Kept] = {
    import spark.implicits._
    firstSeen(spark, docs.select(col("doc_id"),
      md5(lower(trim(col("text"))).cast("binary")).as("h")).as[DocKey], ttl)
  }

  /** The shared first-seen state machine over an arbitrary key column. */
  private def firstSeen(spark: SparkSession, keyed: Dataset[DocKey],
                        ttl: Option[String]): Dataset[Kept] = {
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    keyed
      .groupByKey(_.h)
      .flatMapGroupsWithState[Boolean, Kept](OutputMode.Append(), timeout) {
        (h: String, rows: Iterator[DocKey], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { // TTL expiry tick: no rows, drop the key
            state.remove()
            Iterator.empty
          } else {
            val out =
              if (state.exists) Iterator.empty
              else Iterator.single(Kept(rows.map(_.doc_id).min, h))
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            out
          }
      }
  }

  final case class UrlKept(doc_id: Long, url_key: String, domain: String)

  /** Scala twin of [[graft.llm.Curation.urlDomain]] over an already-
    * canonical url_key: host = the prefix before '/'/'?', registrable
    * domain = last two labels (same simplification, same results — the
    * batch regex `[^.]+\.[^.]+$` requires BOTH trailing labels non-empty,
    * so hosts like `a..b` or `x.y.` stay whole here too; StreamingSpec
    * pins the parity on exactly those malformed shapes). With a
    * [[graft.llm.PublicSuffixes]] table the real lookup applies instead
    * ([[streamingDomainDedup]]'s `psl`). */
  private[graft] def domainOf(urlKey: String,
      psl: Option[graft.llm.PublicSuffixes] = None): String = {
    val host = urlKey.takeWhile(c => c != '/' && c != '?')
    psl match {
      case Some(p) => p.registrable(host)
      case None =>
        val i = host.lastIndexOf('.')
        if (i <= 0 || i == host.length - 1) host // missing/empty last label
        else {
          val j = host.lastIndexOf('.', i - 1)
          if (j == i - 1) host // empty second-to-last label ("a..b")
          else if (j < 0) host
          else host.substring(j + 1)
        }
    }
  }

  /** Streaming per-URL dedup + per-domain cap — [[graft.llm.Curation
    * .domainDedup]]'s continuous twin for a crawl FEED: stage 1 is the
    * [[firstSeen]] state machine keyed on the CANONICAL url (one boolean
    * per distinct URL — the minimum any URL-dedup can hold; `ttl` ages
    * keys out so a re-crawled URL re-enters after the window); stage 2
    * caps each registrable domain with ONE COUNTER of state (never a
    * member list), emitting a keeper only while its domain's count is
    * under `cap` — two CHAINED stateful operators in one append-mode
    * query (the Spark 3.4+ multiple-stateful-operator shape the
    * histogram builder already uses).
    *
    * Order contract (the [[StreamFunnel]] rule): within a micro-batch
    * both stages process doc_id-ascending (stage 1 keeps the min per
    * URL, stage 2 sorts its group), so a ONE-batch stream reproduces
    * the batch operator's keeper set EXACTLY; across batches the
    * cap is first-ARRIVED-wins — a published keeper is never revoked
    * when a smaller doc_id arrives later, the only honest continuous
    * contract (StreamingSpec pins both). The cap counter never expires
    * (a cap is a budget, not a cache); only URL keys take the ttl.
    *
    * `psl` is the registrable-domain table ([[graft.llm.PublicSuffixes]])
    * — pass the SAME table as the batch [[graft.llm.Curation.domainDedup]]
    * run or the two will cap different domains; None = the shared
    * last-two-labels fallback. */
  def streamingDomainDedup(spark: SparkSession, docs: DataFrame, cap: Int,
                           ttl: Option[String] = None,
                           psl: Option[graft.llm.PublicSuffixes] = None)
      : Dataset[UrlKept] = {
    import spark.implicits._
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val keyed = docs.select(col("doc_id"),
      graft.llm.Curation.urlKey(col("url")).as("h")).as[DocKey]
    firstSeen(spark, keyed, ttl)
      .map(k => UrlKept(k.doc_id, k.h, domainOf(k.h, psl)))
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Long, UrlKept](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (dom: String, rows: Iterator[UrlKept], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_.doc_id).iterator
            .takeWhile { _ => n < cap }
            .map { r => n += 1; r }
            .toVector
          state.update(n)
          out.iterator
      }
  }
}
