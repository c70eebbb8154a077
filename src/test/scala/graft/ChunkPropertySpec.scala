package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ops.TextAnalysis

/** Property tests for sliding-window chunking: coverage and overlap
  * invariants must hold for every (doc length, window, stride) shape,
  * not just the handcrafted boundary cases in CurationSpec. */
class ChunkPropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  test("every token is covered; stride==window tiles exactly; chunk sizes legal") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 200)
      window <- Gen.choose(1, 40)
      stride <- Gen.choose(1, window)
    } yield (n, window, stride)
    check(Prop.forAll(gen) { case (n, window, stride) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val rows = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
          window = window, stride = stride)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      val ids = rows.map(_._1)
      val covered = rows.flatMap { case (cid, _, ctext) =>
        ctext.split(" ").toSeq
      }.toSet
      // chunk ids are a dense 0..k range
      (ids.toSeq == (0L until ids.length.toLong)) &&
        // every token of the doc appears in some chunk
        covered == (1 to n).map(i => s"t$i").toSet &&
        // every chunk holds 1..window tokens; only the LAST may be short
        rows.forall { case (_, len, _) => len >= 1 && len <= window } &&
        rows.init.forall { case (_, len, _) => len == window } &&
        // exact tiling when stride == window: token counts sum to n
        (stride != window || rows.map(_._2).sum == n)
    })
  }
}
