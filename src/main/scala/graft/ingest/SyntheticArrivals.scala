package graft.ingest

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import graft.core.Schemas.Arrival

/** Deterministic synthetic-arrivals generator — the offline stand-in for
  * the TfL `/StopPoint/{id}/Arrivals` source (payload shape per
  * FIXTURES.md §1; this environment has zero egress). Seeded splitmix64 →
  * identical snapshots across runs, including the dirty-data cases the
  * reference's pipeline must tolerate: occasional NULL fields and
  * malformed timestamps (exercising try_cast staging, SURVEY P4/P9).
  */
object SyntheticArrivals {

  val Lines: Seq[String] = Seq("central", "victoria", "jubilee")
  val Stops: Seq[String] = (1 to 10).map(i => f"940GZZLUTS$i%02d")

  private val iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(ZoneOffset.UTC)

  private final class Rng(seed: Long) {
    private var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = ((next() >>> 1) % bound).toInt
  }

  /** One polled snapshot: ~`perStop` predictions per stop at `asOf`.
    * ~2% null platform, ~2% malformed timestamp, ~1% null stopId —
    * mirroring the `.get()`-tolerant reference ingest.
    */
  def snapshot(asOf: Instant, seed: Long = 42L, perStop: Int = 6): Seq[Arrival] = {
    val rng = new Rng(seed ^ asOf.getEpochSecond)
    for {
      stop <- Stops
      line = Lines(rng.nextInt(Lines.size))
      _ <- 1 to perStop
    } yield {
      val ttl = rng.nextInt(1800)
      val eventTs = asOf.plusSeconds(ttl)
      val roll = rng.nextInt(100)
      Arrival(
        stopId = if (roll == 0) None else Some(stop),
        lineId = Some(line),
        platformName = if (roll < 3) None else Some(s"Platform ${rng.nextInt(4) + 1}"),
        destinationName = Some(s"${line.capitalize} Terminus ${rng.nextInt(2) + 1}"),
        timeToStation = Some(ttl.toLong),
        timestamp =
          if (roll == 4) Some("not-a-timestamp")
          else Some(iso.format(eventTs)))
    }
  }

  /** A synthetic HTTP transport serving TfL-shaped JSON bodies — lets the
    * whole ingest path (fetch → decode → write) run offline through the
    * same [[Http]] policy code as production.
    */
  def transport(asOf: Instant, seed: Long = 42L): Http.Transport = { url =>
    val stop = url.split("/").takeRight(2).head
    val rows = snapshot(asOf, seed).filter(_.stopId.contains(stop))
    val body = rows.zipWithIndex.map { case (a, i) =>
      def q(v: Option[String]) = v.map(s => "\"" + s + "\"").getOrElse("null")
      val lineName = a.lineId.map(_.capitalize)
      val vehicle = Some(s"veh${(i * 131 + stop.hashCode.abs % 997) % 10000}")
      s"""{"naptanId": ${q(a.stopId)}, "lineId": ${q(a.lineId)},
         | "lineName": ${q(lineName)},
         | "platformName": ${q(a.platformName)},
         | "destinationName": ${q(a.destinationName)},
         | "timeToStation": ${a.timeToStation.getOrElse(0L)},
         | "timestamp": ${q(a.timestamp)},
         | "expectedArrival": ${q(a.timestamp)},
         | "vehicleId": ${q(vehicle)}}""".stripMargin.replaceAll("\n", "")
    }.mkString("[", ",", "]")
    Http.Response(200, body)
  }
}
