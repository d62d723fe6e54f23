package graft

import java.nio.file.Files

import graft.sources.Tables

/** Format-aware catalog: parquet preferred, CSV (with pinned schema)
  * and line-JSON resolve too; missing tables error clearly.
  */
class TablesSpec extends SparkTestBase {

  private lazy val tmp = {
    val d = Files.createTempDirectory("graft-tables").toFile
    d.deleteOnExit()
    Files.writeString(d.toPath.resolve("people.csv"), "id,name\n1,ada\n2,grace\n")
    Files.writeString(d.toPath.resolve("events.json"), """{"id":1,"kind":"x"}""" + "\n" + """{"id":2,"kind":"y"}""" + "\n")
    d.getAbsolutePath
  }

  test("csv resolves with a pinned schema") {
    val cat = Tables.dir(spark, tmp, csvSchemas = Map("people" -> "id INT, name STRING"))
    val df = cat("people")
    assert(df.schema.simpleString == "struct<id:int,name:string>")
    assert(df.count() == 2)
    val out = Pql.query(spark, """people | where name == "ada" | project id""", cat)
    assert(out.collect().map(_.getInt(0)).sameElements(Array(1)))
  }

  test("line-json resolves") {
    val cat = Tables.dir(spark, tmp)
    assert(cat("events").count() == 2)
  }

  test("orc resolves, schema carried through the round trip") {
    import SparkTestBase.spark.implicits._
    val d = Files.createTempDirectory("graft-orc").toFile
    d.deleteOnExit()
    Seq((1, "ada"), (2, "grace")).toDF("id", "name")
      .write.mode("overwrite").orc(s"${d.getAbsolutePath}/people.orc")
    val df = Tables.dir(spark, d.getAbsolutePath)("people")
    assert(df.schema.simpleString == "struct<id:int,name:string>") // no inference, no pinning
    assert(df.orderBy("id").collect().map(_.getString(1)).sameElements(Array("ada", "grace")))
  }

  test("parquet takes precedence and nano timestamps are normalized") {
    val cat = Tables.dir(spark, "/root/testdata/sf0.001")
    val ev = cat("events")
    assert(ev.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(ev.count() > 0)
  }

  test("missing table raises a clear error") {
    val cat = Tables.dir(spark, tmp)
    val e = intercept[IllegalArgumentException](cat("nope"))
    assert(e.getMessage.contains("nope"))
  }
}
