package graft

import graft.pipeline.MetadataGates

/** Fail-fast metadata gates (`R/preprocess-metadata-tables.R:113-344`). */
class MetadataGatesSpec extends SparkSpec {
  import spark.implicits._

  test("vmsInstalls: damage after install passes, damage before install throws") {
    val ok = Seq(
      ("A", "installation", "2024-01-01"),
      ("A", "damage recorded", "2024-06-01"),
      ("B", "installation", "2024-02-01")
    ).toDF("device_imei", "device_event_type", "device_event_date")
    assert(MetadataGates.vmsInstalls(ok).count() == 3)

    val bad = Seq(
      ("C", "installation", "2024-05-01"),
      ("C", "damage recorded", "2024-01-01")
    ).toDF("device_imei", "device_event_type", "device_event_date")
    val e = intercept[IllegalStateException](MetadataGates.vmsInstalls(bad))
    assert(e.getMessage.contains("damage recorded prior"))
  }

  test("flags: message-less rows dropped; missing or duplicate ids throw") {
    val ok = Seq(("1", "cat", "msg"), ("2", "cat", "msg2"),
      ("3", "cat", null)).toDF("flag_id", "flag_category", "flag_message")
    assert(MetadataGates.flags(ok).count() == 2)

    val dup = Seq(("1", "c", "m"), ("1", "c", "m2"))
      .toDF("flag_id", "flag_category", "flag_message")
    assert(intercept[IllegalStateException](MetadataGates.flags(dup))
      .getMessage.contains("duplicated"))

    val noId = Seq(("1", "c", "m"), (null, "c", "m2"))
      .toDF("flag_id", "flag_category", "flag_message")
    assert(intercept[IllegalStateException](MetadataGates.flags(noId))
      .getMessage.contains("without a flag_id"))
  }

  test("boats: lengths must sit strictly inside (0, 30); nulls pass") {
    val ok = Seq((1L, Some(7.5), "2024-01-01 10:30"), (2L, None, "2024-01-01 10:30"))
      .toDF("boat_id", "boat_length", "last_modified_time")
    val parsed = MetadataGates.boats(ok)
    assert(parsed.count() == 2)
    assert(parsed.schema("last_modified_time").dataType.typeName == "timestamp")

    val bad = Seq((3L, Some(45.0), "2024-01-01 10:30"))
      .toDF("boat_id", "boat_length", "last_modified_time")
    assert(intercept[IllegalStateException](MetadataGates.boats(bad))
      .getMessage.contains("invalid lengths"))
  }
}
