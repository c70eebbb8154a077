package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 scratch probe: min-of-N timing of candidate shapes for the
  * sf0.1-gate tail (q52 exact quantiles, q38 single-scan profile).
  * Usage: R18Probe <sfDir> <runs> <variant1,variant2,...> */
object R18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val variants = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(10000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").collect()
    val li = () => spark.read.parquet(s"$sfDir/lineitem.parquet")
    li().count()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)

    def time(name: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r18probe] $name min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    variants.foreach {
      case "q52_twophase" => time("q52_twophase")(() =>
        graft.ops.Profiler.quantileProfile(li(), cols, ps, Long.MaxValue)
          .orderBy("column"))
      case "q52_small" => time("q52_small")(() =>
        graft.ops.Profiler.quantileProfile(li(), cols, ps, 0L)
          .orderBy("column"))
      case "q52_pctl" => time("q52_pctl")(() => {
        val df = graft.ops.Spread.wide(li().select(cols.map(col): _*),
          Some(hash(cols.map(col): _*)))
        val aggs = cols.flatMap { c =>
          Seq(min(col(c).cast("double")).as(s"${c}__min"),
            percentile(col(c).cast("double"),
              typedlit(ps)).as(s"${c}__q"),
            max(col(c).cast("double")).as(s"${c}__max"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = cols.map(c =>
          s"'$c', `${c}__min`, `${c}__q`, `${c}__max`").mkString(", ")
        one.selectExpr(
            s"stack(${cols.length}, $stackArgs) AS (column, minv, q, maxv)")
          .select(Seq(col("column"), round(col("minv"), 4).as("minv")) ++
            ps.zipWithIndex.map { case (p, i) =>
              round(element_at(col("q"), i + 1), 4)
                .as(s"p${math.round(p * 100)}") } ++
            Seq(round(col("maxv"), 4).as("maxv")): _*)
          .orderBy("column")
      })
      case "q52_pctl_nospread" => time("q52_pctl_nospread")(() => {
        val df = li().select(cols.map(col): _*)
        val aggs = cols.flatMap { c =>
          Seq(min(col(c).cast("double")).as(s"${c}__min"),
            percentile(col(c).cast("double"),
              typedlit(ps)).as(s"${c}__q"),
            max(col(c).cast("double")).as(s"${c}__max"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stackArgs = cols.map(c =>
          s"'$c', `${c}__min`, `${c}__q`, `${c}__max`").mkString(", ")
        one.selectExpr(
            s"stack(${cols.length}, $stackArgs) AS (column, minv, q, maxv)")
          .select(Seq(col("column"), round(col("minv"), 4).as("minv")) ++
            ps.zipWithIndex.map { case (p, i) =>
              round(element_at(col("q"), i + 1), 4)
                .as(s"p${math.round(p * 100)}") } ++
            Seq(round(col("maxv"), 4).as("maxv")): _*)
          .orderBy("column")
      })
      case "q38_now" => time("q38_now")(() =>
        graft.ops.Profiler.profileSingleScan(
          spark.read.parquet(s"$sfDir/orders.parquet")).orderBy("column"))
      case "q38_nospread" => time("q38_nospread")(() => {
        val df = spark.read.parquet(s"$sfDir/orders.parquet")
        import org.apache.spark.sql.types._
        val stackArgs = df.schema.fields.map { f =>
          val ident = "`" + f.name + "`"
          val (vl, vd, vs) = f.dataType match {
            case ByteType | ShortType | IntegerType | LongType | BooleanType =>
              (s"CAST($ident AS BIGINT)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS STRING)")
            case DateType =>
              (s"CAST(unix_date($ident) AS BIGINT)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS STRING)")
            case TimestampType =>
              (s"unix_micros($ident)", "CAST(NULL AS DOUBLE)", "CAST(NULL AS STRING)")
            case FloatType | DoubleType =>
              ("CAST(NULL AS BIGINT)", s"(CAST($ident AS DOUBLE) + 0.0)", "CAST(NULL AS STRING)")
            case _ =>
              ("CAST(NULL AS BIGINT)", "CAST(NULL AS DOUBLE)", s"CAST($ident AS STRING)")
          }
          s"'${f.name}', $vl, $vd, $vs"
        }.mkString(", ")
        df.selectExpr(
            s"stack(${df.columns.length}, $stackArgs) AS (column, vl, vd, vs)")
          .groupBy("column", "vl", "vd", "vs").agg(count(lit(1)).as("cnt"))
          .groupBy("column").agg(
            sum("cnt").as("n_rows"),
            coalesce(sum(when(col("vl").isNull && col("vd").isNull &&
              col("vs").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
            count_if(col("vl").isNotNull || col("vd").isNotNull ||
              col("vs").isNotNull).as("n_distinct"))
          .orderBy("column")
      })
      case "q38_countdistinct" => time("q38_countdistinct")(() => {
        val df = spark.read.parquet(s"$sfDir/orders.parquet")
        graft.ops.Profiler.profile(df).orderBy("column")
      })
      case other => println(s"[r18probe] unknown variant $other")
    }
    spark.stop()
  }
}
