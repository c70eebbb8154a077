package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SheetBackend

/** DataSource V2 sheet connector: truncate+overwrite write path, read
  * path for the dry-run diff, short-name registration. */
class SheetSinkSpec extends SparkSpec {

  test("write is clear+update with header; sorted input keeps order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sheet").toString
    val df = Seq((5417L, "Loto", 1000L), (5417L, "Desquite", 510L))
      .toDF("sorteo", "categoria", "pozo_clp")
      .orderBy("categoria")
      .select(col("sorteo").cast("string"), col("categoria"), col("pozo_clp").cast("string"))
    df.write.format("sheet").option("path", dir).option("worksheet", "canon")
      .mode("append").save()
    val rows = SheetBackend.readRows(dir, "canon")
    assert(rows.head == Seq("sorteo", "categoria", "pozo_clp"))
    assert(rows.drop(1) == Seq(
      Seq("5417", "Desquite", "510"), Seq("5417", "Loto", "1000")))

    // second write truncates (clear+update), never appends
    Seq(("1", "X", "9")).toDF("sorteo", "categoria", "pozo_clp")
      .write.format("sheet").option("path", dir).option("worksheet", "canon")
      .mode("append").save()
    val after = SheetBackend.readRows(dir, "canon")
    assert(after.length == 2)
    assert(after(1) == Seq("1", "X", "9"))
  }

  test("read path round-trips for the dry-run diff") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sheet").toString
    Seq(("a", "1"), ("b", "2")).toDF("k", "v")
      .write.format("sheet").option("path", dir).option("worksheet", "w").mode("append").save()
    val back = spark.read.format("sheet")
      .option("path", dir).option("worksheet", "w").load()
    assert(back.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("nulls become empty cells") {
    import spark.implicits._
    val dir = Files.createTempDirectory("sheet").toString
    Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .write.format("sheet").option("path", dir).option("worksheet", "n").mode("append").save()
    assert(SheetBackend.readRows(dir, "n")(1) == Seq("x", ""))
  }
}
