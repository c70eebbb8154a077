package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col
import graft.sources.{DomPozoSource, Fetcher, FixtureTransport, HtmlPozoSource, PozoSource}

/** Golden source-smoke harness, replicating the reference convention
  * verbatim (`tests/test_smoke_sources.py:19-70`): one directory per
  * source under `fixtures/sources/<name>/{page.html, expected.json}`,
  * auto-parametrized; every asserted key in expected.json must equal the
  * fetcher's output. Drop a new fixture dir → it's tested, no code. */
class GoldenSourcesSpec extends SparkSpec {

  private val fixturesRoot = Paths.get("src/test/resources/fixtures/sources")

  private val sourceCfg: Map[String, (String, Boolean)] = Map(
    "openloto" -> ("https://www.openloto.cl/pozo-del-loto.html", false),
    "polla" -> ("https://www.polla.cl/es/", true))

  private val expectedSchema = StructType(Seq(
    StructField("montos", MapType(StringType, LongType)),
    StructField("sorteo", LongType),
    StructField("fecha", StringType),
    StructField("estimado", BooleanType)))

  import scala.jdk.CollectionConverters._

  private def dirs: Seq[Path] = {
    val s = Files.list(fixturesRoot)
    try s.iterator().asScala.filter(Files.isDirectory(_)).toSeq.sortBy(_.toString)
    finally s.close()
  }

  for (dir <- dirs) {
    val name = dir.getFileName.toString
    test(s"golden source fixture: $name") {
      val (url, allowTotal) = sourceCfg.getOrElse(name,
        fail(s"no source config for fixture dir $name"))
      val html = Files.readString(dir.resolve("page.html"))
      val fetcher = new Fetcher(new FixtureTransport(Map(url -> html)))
      // polla runs the DOM-selector adapter (the SPA path); the rest
      // run text-flatten — mirrors Main.sources
      val src: PozoSource =
        if (name == "polla") new DomPozoSource(name, 0, url, "TestBot/1.0", fetcher)
        else new HtmlPozoSource(name, 0, url, "TestBot/1.0", fetcher, allowTotal)
      val payload = src.fetch()

      val exp = spark.read.schema(expectedSchema)
        .option("multiLine", "true").json(dir.resolve("expected.json").toString)
        .collect().head

      Option(exp.getAs[scala.collection.Map[String, Long]]("montos")).foreach { m =>
        m.foreach { case (cat, want) =>
          assert(payload.montos.get(cat).contains(want),
            s"$name montos[$cat]: got ${payload.montos.get(cat)}, want $want")
        }
      }
      if (!exp.isNullAt(exp.fieldIndex("sorteo")))
        assert(payload.sorteo.contains(exp.getAs[Long]("sorteo")))
      if (!exp.isNullAt(exp.fieldIndex("fecha")))
        assert(payload.fecha.contains(exp.getAs[String]("fecha")))
      if (!exp.isNullAt(exp.fieldIndex("estimado")))
        assert(payload.estimado == exp.getAs[Boolean]("estimado"))
    }
  }
}
