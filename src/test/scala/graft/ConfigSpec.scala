package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Config

/** Config hygiene (SURVEY P8/F6): env-only credentials, order-preserving
  * stop-list dedup.
  */
class ConfigSpec extends AnyFunSuite {

  test("stop list: comma-split, trimmed, deduped preserving first occurrence") {
    assert(Config.parseStopIds("a, b,a , c,,b") == Seq("a", "b", "c"))
    assert(Config.parseStopIds("") == Seq.empty)
    assert(Config.parseStopIds(" x ") == Seq("x"))
  }

  test("stopIds falls back to synthetic stops when env unset") {
    assert(Config.stopIds(Map.empty).nonEmpty)
    assert(Config.stopIds(Map("TFL_STOPPOINT_IDS" -> "s2,s1,s2")) == Seq("s2", "s1"))
  }

  test("credentials require both id and key, from env only") {
    assert(Config.credentials(Map.empty).isEmpty)
    assert(Config.credentials(Map("TFL_APP_ID" -> "i")).isEmpty)
    assert(Config.credentials(Map("TFL_APP_ID" -> "i", "TFL_APP_KEY" -> "k"))
      .contains(("i", "k")))
  }
}
