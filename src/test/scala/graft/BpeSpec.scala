package graft

import graft.ops.Bpe

/** BPE merge learning graded against an independent in-test reference
  * implementation (naive in-memory Sennrich-style learner over the same
  * word-frequency table), plus partitioning-invariance and encode checks. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: exact pair counting over (word → freq), top pair by
    * (count DESC, left ASC, right ASC), greedy left-to-right single-pass
    * application. Mirrors the paper's `get_stats`/`merge_vocab`. */
  private def refBpe(wordFreq: Map[String, Long], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var segs: Map[String, (Seq[String], Long)] =
      wordFreq.map { case (w, f) => w -> (w.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- segs; p <- syms.zip(syms.drop(1)))
        counts(p) = counts.getOrElse(p, 0L) + f
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += ((l, r, c))
        segs = segs.map { case (w, (syms, f)) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.toSeq, f)
        }
      }
    }
    (merges.toSeq, segs.map { case (w, (s, _)) => w -> s })
  }

  // the paper's classic toy corpus plus run-heavy words that exercise the
  // non-overlapping greedy pass (aaaa under an (a,a) merge → [aa, aa])
  private val corpusFreq = Map[String, Long](
    "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3,
    "aaaa" -> 4, "aaa" -> 4, "banana" -> 3)

  private def corpusDf = corpusFreq.toSeq
    .flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("learned merges match the naive reference learner exactly") {
    val (expMerges, expSegs) = refBpe(corpusFreq, nMerges = 10)
    val (got, finalWords) = Bpe.train(corpusDf, nMerges = 10,
      materializeEvery = 3)
    assert(got.map(m => (m.l_sym, m.r_sym, m.freq)) == expMerges,
      s"merge table diverged: $got vs $expMerges")
    assert(got.map(_.merge_round) == (1 to got.size), "rounds must be 1..M")
    assert(got.forall(m => m.merged == m.l_sym + m.r_sym))
    val segs = finalWords.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs == expSegs, s"segmentations diverged: $segs vs $expSegs")
  }

  test("merge application is a non-overlapping greedy pass on runs") {
    // isolate the (a,a) merge: "aaaa" → [aa,aa], "aaa" → [aa,a]
    val words = Seq(("aaaa", 1L), ("aaa", 1L)).toDF("word", "freq")
      .withColumn("syms", org.apache.spark.sql.functions.transform(
        org.apache.spark.sql.functions.sequence(
          org.apache.spark.sql.functions.lit(1),
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("word"))),
        i => org.apache.spark.sql.functions.col("word").substr(
          i, org.apache.spark.sql.functions.lit(1))))
    val merged = Bpe.applyMerge(words, "a", "a").collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(merged("aaaa") == Seq("aa", "aa"))
    assert(merged("aaa") == Seq("aa", "a"))
  }

  test("training is invariant to input partitioning") {
    val (m3, _) = Bpe.train(corpusDf.repartition(3), nMerges = 6)
    val (m17, _) = Bpe.train(corpusDf.repartition(17), nMerges = 6)
    assert(m3 == m17, "merges must not depend on partitioning")
  }

  test("encode counts: subtokens sum final segment counts; OOV counts 1") {
    val (_, finalWords) = Bpe.train(corpusDf, nMerges = 10)
    val (_, expSegs) = refBpe(corpusFreq, nMerges = 10)
    val docs = Seq(
      (0L, "low lower banana"),
      (1L, "newest ?!? aaaa"), // ?!? is out-of-alphabet → 1 subtoken
      (2L, "unseen low")       // 'unseen' not in vocab → 1 opaque subtoken
    ).toDF("doc_id", "text")
    val got = Bpe.encodeCounts(docs, finalWords).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exp0 = expSegs("low").size + expSegs("lower").size + expSegs("banana").size
    val exp1 = expSegs("newest").size + 1 + expSegs("aaaa").size
    assert(got(0L) == ((3L, exp0.toLong)), s"doc0: ${got(0L)} vs $exp0")
    assert(got(1L) == ((3L, exp1.toLong)), s"doc1: ${got(1L)} vs $exp1")
    assert(got(2L) == ((2L, (1 + expSegs("low").size).toLong)))
  }

  test("stops early when the vocabulary is fully merged") {
    val tiny = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val (m, w) = Bpe.train(tiny, nMerges = 50)
    assert(m.size == 1 && m.head.merged == "ab")
    assert(w.collect().map(_.getSeq[String](2)).toSeq == Seq(Seq("ab")))
  }

  test("driver-side branch ≡ distributed loop (merges and segmentation)") {
    // below SmallCorpusGate the merge loop runs on the driver (r19); the
    // two branches must learn the SAME merges and segment identically —
    // run-heavy words exercise the greedy non-overlap fold on both sides
    val (distM, distW) = Bpe.train(corpusDf, nMerges = 10)
    val (drvM, drvW) = Bpe.train(corpusDf, nMerges = 10,
      corpusDocs = Some(corpusFreq.values.sum))
    assert(drvM == distM, s"merges diverged: $drvM vs $distM")
    def segs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2)))).toMap
    assert(segs(drvW) == segs(distW), "segmentation frames diverged")
    // and the driver branch also matches the naive reference directly
    val (expMerges, expSegs) = refBpe(corpusFreq, nMerges = 10)
    assert(drvM.map(m => (m.l_sym, m.r_sym, m.freq)) == expMerges)
    assert(segs(drvW).map { case (w, (_, s)) => w -> s } == expSegs)
    // above the gate the hint must NOT take the driver branch (pin the
    // gate direction, not just the values)
    val (bigM, _) = Bpe.train(corpusDf, nMerges = 3,
      corpusDocs = Some(Bpe.SmallCorpusGate + 1))
    assert(bigM == distM.take(3))
  }

  test("driver-side early stop on a fully merged vocabulary") {
    val tiny = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val (m, w) = Bpe.train(tiny, nMerges = 50, corpusDocs = Some(3L))
    assert(m.size == 1 && m.head.merged == "ab")
    assert(w.collect().map(_.getSeq[String](2)).toSeq == Seq(Seq("ab")))
  }
}
