package graft.ingest

/** Ingest configuration hygiene (reference `tfl_ingest_dag.py:13-23`):
  * credentials and stop lists come from environment variables only — the
  * reference's `.env` credentials are NOT copied anywhere — and the stop
  * list is comma-split, trimmed, and de-duplicated PRESERVING first
  * occurrence order (SURVEY P8/F6: the reference's `dict.fromkeys` idiom).
  */
object Config {

  /** `"a, b,a , c"` → `Seq("a", "b", "c")` — order-preserving dedup. */
  def parseStopIds(raw: String): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    raw.split(",").iterator.map(_.trim).filter(_.nonEmpty).foreach(seen += _)
    seen.toSeq
  }

  def stopIds(env: Map[String, String] = sys.env): Seq[String] =
    env.get("TFL_STOPPOINT_IDS").map(parseStopIds)
      .filter(_.nonEmpty)
      .getOrElse(SyntheticArrivals.Stops)

  /** App credentials, env-only (never hard-coded, never logged). */
  def credentials(env: Map[String, String] = sys.env): Option[(String, String)] =
    for {
      id <- env.get("TFL_APP_ID")
      key <- env.get("TFL_APP_KEY")
    } yield (id, key)
}
