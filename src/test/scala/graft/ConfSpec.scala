package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Conf

class ConfSpec extends AnyFunSuite {

  private val fixture =
    """default:
      |  surveys:
      |    kobo_username: !expr Sys.getenv('KOBO_USERNAME')
      |    landings_3:
      |      asset_id: ${KOBO_ASSET}
      |      file_prefix: timor-landings-v3
      |      version:
      |        preprocess: latest
      |  pds:
      |    tracks:
      |      multisession:
      |        n_sessions: 32
      |      complete:
      |        new_trips: 1000
      |  validation:
      |    k_catch: 2.5
      |    enabled: true
      |
      |production:
      |  pds:
      |    tracks:
      |      multisession:
      |        n_sessions: 128
      |""".stripMargin

  private val env = Map(
    "KOBO_USERNAME" -> "alice", "KOBO_ASSET" -> "a9x").get _

  test("dotted-path typed getters over the default profile") {
    val c = Conf.load(fixture, env = env)
    assert(c.str("surveys.landings_3.file_prefix") == "timor-landings-v3")
    assert(c.str("surveys.landings_3.version.preprocess") == "latest")
    assert(c.int("pds.tracks.multisession.n_sessions") == 32)
    assert(c.long("pds.tracks.complete.new_trips") == 1000L)
    assert(c.double("validation.k_catch") == 2.5)
    assert(c.bool("validation.enabled"))
    assert(c.opt("nope.nothing").isEmpty)
    intercept[NoSuchElementException](c.str("nope.nothing"))
  }

  test("env indirection: !expr Sys.getenv and ${VAR} forms") {
    val c = Conf.load(fixture, env = env)
    assert(c.str("surveys.kobo_username") == "alice")
    assert(c.str("surveys.landings_3.asset_id") == "a9x")
    val missing = Conf.load(fixture, env = _ => None)
    assert(missing.str("surveys.kobo_username") == "")
  }

  test("named profile deep-merges over default") {
    val c = Conf.load(fixture, profile = "production", env = env)
    assert(c.int("pds.tracks.multisession.n_sessions") == 128)
    // untouched sibling keys survive the merge
    assert(c.long("pds.tracks.complete.new_trips") == 1000L)
    assert(c.str("surveys.landings_3.file_prefix") == "timor-landings-v3")
  }

  test("builtin defaults mirror the reference's analytics keys") {
    val c = Conf.default
    assert(c.int("pds.tracks.multisession.n_sessions") == 32)
    assert(c.long("pds.tracks.complete.new_trips") == 1000L)
    assert(c.double("validation.landings.k_catch") == 2.5)
    assert(c.double("validation.landings.price_per_kg_max") == 30.0)
    assert(c.str("estimation.frame_start") == "2018-01-01")
    assert(c.int("estimation.small_group_copies") == 5)
  }
}
