package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader error-tolerance modes (R17 / SURVEY §0.1-4): permissive
  * parsing nulls out malformed fields and captures the raw record;
  * failfast propagates. Mirrors the reference's swallowed
  * RequestException semantics at the file-source boundary. */
class ReaderModeSpec extends SparkSpec {
  import spark.implicits._

  private val csv = Seq(
    "tx_hash,block_number",
    "0xh1,100",
    "0xh2,not_a_number",
    "0xh3,300")

  private def stage(): String = {
    val dir = Files.createTempDirectory("graft_csvmode")
    Files.write(dir.resolve("data.csv"),
      csv.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  private val schema = StructType(Seq(
    StructField("tx_hash", StringType),
    StructField("block_number", LongType),
    StructField("_corrupt_record", StringType)))

  test("permissive mode nulls the bad field and keeps the row") {
    val df = spark.read.option("header", true).option("mode", "PERMISSIVE")
      .schema(schema).csv(stage())
    val rows = df.select("tx_hash", "block_number", "_corrupt_record")
      .as[(String, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(1) == (("0xh2", None, Some("0xh2,not_a_number"))))
    assert(rows(0)._2.contains(100L) && rows(2)._2.contains(300L))
  }

  test("failfast mode raises on the malformed row") {
    val df = spark.read.option("header", true).option("mode", "FAILFAST")
      .schema(StructType(schema.fields.take(2))).csv(stage())
    intercept[org.apache.spark.SparkException] { df.collect() }
  }
}
