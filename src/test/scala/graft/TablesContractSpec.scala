package graft

import org.apache.spark.sql.types._

/** Schema contract for the driver test tables.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed a physical type once (events.ts nanos → µs-NTZ),
  * which silently broke two queries for two rounds. This spec turns the
  * next such change into a 1-line diagnosis: it pins the SPARK-side
  * schema each table presents THROUGH `Tables` (i.e. after any
  * normalization the loaders apply), which is the surface every query
  * and oracle is written against.
  *
  * If this spec fails after a testdata regeneration: first check
  * whether `Tables` needs a new normalization branch (events.ts has
  * one), then whether oracles relying on the old type still hash-match,
  * and only then update the pin. */
class TablesContractSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // events goes through Tables.events normalization: ts is ALWAYS
    // session-TZ TimestampType on the query-facing side
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (t <- Tables.names) {
    test(s"$t presents the pinned query-facing schema") {
      val df = t match {
        case "events" => Tables.events(spark, sf("sf0.001"))
        case other    => Tables.load(spark, sf("sf0.001"), other)
      }
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      // compare element types ignoring array containsNull (parquet
      // always reports nullable elements)
      def norm(d: DataType): DataType = d match {
        case ArrayType(e, _) => ArrayType(norm(e))
        case x => x
      }
      val gotN = got.map { case (n, d) => n -> norm(d) }
      val expN = expected(t).map { case (n, d) => n -> norm(d) }
      assert(gotN == expN,
        s"\n$t schema drifted.\n  got:      $gotN\n  expected: $expN\n" +
          "If the driver regenerated testdata, see the Scaladoc above for triage order.")
    }
  }

  test("key columns carry no nulls the operators would trip on") {
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    assert(Tables.documents(spark, d)
      .filter(col("doc_id").isNull || col("text").isNull).count() == 0,
      "documents doc_id/text must be non-null (tokenizers, dedup keys)")
    assert(Tables.events(spark, d)
      .filter(col("ts").isNull || col("user_id").isNull).count() == 0,
      "events ts/user_id must be non-null (sessions, as-of, funnels)")
    assert(Tables.embeddings(spark, d)
      .filter(col("embedding").isNull).count() == 0,
      "embeddings must be non-null (ANN, quantization)")
  }
}
