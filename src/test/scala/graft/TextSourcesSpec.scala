package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextSources

/** Text-source discipline: schema-enforced reads, corrupt-record
  * quarantine, exact roundtrips (the full-table roundtrips are
  * oracle-checked as json_roundtrip / csv_roundtrip). */
class TextSourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("malformed JSONL lines land in _corrupt_record, good lines parse") {
    val dir = Files.createTempDirectory("graft_json_bad")
    Files.write(dir.resolve("part-00000.json"),
      """{"a": 1, "b": "ok"}
        |{not json at all
        |{"a": "wrong type", "b": "typed"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = new StructType().add("a", LongType).add("b", "string")
    val rows = TextSources.readJsonl(spark, dir.toString, schema).collect()
    assert(rows.length === 3)
    val good = rows.filter(_.isNullAt(2))
    val bad = rows.filterNot(_.isNullAt(2))
    assert(good.length === 1 && good.head.getLong(0) === 1L && good.head.getString(1) === "ok")
    // both the syntax error and the type mismatch are quarantined with the
    // raw line preserved for forensics
    assert(bad.length === 2)
    assert(bad.exists(_.getString(2).contains("not json")))
    assert(bad.exists(_.getString(2).contains("wrong type")))
  }

  test("CSV quoting survives embedded quotes, commas and braces") {
    val df = Seq(
      (1L, """{"k": 1, "s": "a,b"}"""),
      (2L, """say "hi", twice""")).toDF("id", "payload")
    val dir = Files.createTempDirectory("graft_csv_rt").toString + "/out"
    TextSources.writeCsv(df, dir)
    val back = TextSources.readCsv(spark, dir, df.schema)
      .drop("_corrupt_record").as[(Long, String)].collect().toMap
    assert(back(1L) === """{"k": 1, "s": "a,b"}""")
    assert(back(2L) === """say "hi", twice""")
  }
}
