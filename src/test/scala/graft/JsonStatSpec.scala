package graft

import graft.ingest.JsonStat
import org.apache.spark.sql.functions._

/** JSON-stat stride decode vs a hand-decoded fixture (the semantics of
  * `scripts/extract_eurostat.py:120-178`: row-major flat index over
  * ordered dimensions, sparse value map).
  */
class JsonStatSpec extends SparkSpec {
  import spark.implicits._

  // dims: geo(size 2: DE,FR) × time(size 3: 2020,2021,2022) row-major →
  // flat = geoPos * 3 + timePos
  private val payload =
    """{
      |  "id": ["geo", "time"],
      |  "size": [2, 3],
      |  "value": {"0": 100.0, "4": 250.0, "5": 260.0},
      |  "dimension": {
      |    "geo":  {"category": {"index": {"DE": 0, "FR": 1},
      |                          "label": {"DE": "Germany", "FR": "France"}}},
      |    "time": {"category": {"index": {"2020": 0, "2021": 1, "2022": 2},
      |                          "label": {"2020": "2020", "2021": "2021", "2022": "2022"}}}
      |  }
      |}""".stripMargin

  test("sparse flat indices decode to per-dimension codes and labels") {
    val df = Seq(("test_ds", payload)).toDF("dataset_code", "payload")
    val out = JsonStat.decode(df, Seq("geo", "time"))
      .orderBy("value")
      .collect()
      .map(r => (r.getDouble(1), r.getString(2), r.getString(3), r.getString(4)))
    // (value, geo_code, geo_label, time_code)
    assert(out.toSeq == Seq(
      (100.0, "DE", "Germany", "2020"),  // flat 0 → DE × 2020
      (250.0, "FR", "France", "2021"),   // flat 4 → FR × 2021
      (260.0, "FR", "France", "2022")))  // flat 5 → FR × 2022
  }

  test("only present (sparse) cells are emitted") {
    val df = Seq(("test_ds", payload)).toDF("dataset_code", "payload")
    assert(JsonStat.decode(df, Seq("geo", "time")).count() == 3)
  }

  test("corrupt payloads are dropped by decode and surfaced by the audit") {
    val mixed = Seq(
      ("ok", payload),
      ("not_json", "{{{"),
      ("wrong_shape", """{"hello": "world"}"""),
      // parses, but no dimension map: decode would emit null-code rows
      ("no_dims", """{"id":["geo"],"size":[1],"value":{"0":1.0}}"""),
      ("null_payload", null: String)).toDF("dataset_code", "payload")
    // decode: only the valid payload's cells come out, nothing throws
    assert(JsonStat.decode(mixed, Seq("geo", "time"))
      .filter(col("geo_code").isNotNull).count() == 3)
    // audit: every non-decodable payload is reported with its code
    val bad = JsonStat.corruptPayloads(mixed)
      .select("dataset_code").collect().map(_.getString(0)).toSet
    assert(bad == Set("not_json", "wrong_shape", "no_dims", "null_payload"))
  }
}
