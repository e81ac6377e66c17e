package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential properties for the TPC-H decorrelations: on arbitrary
  * random fact frames the window/semi-join rewrites must equal a driver
  * fold of the TEXTBOOK correlated definitions (EXISTS / NOT EXISTS /
  * scalar AVG / nested IN). The DuckDB oracles already cross-check an
  * independent SQL formulation on the driver testbed; these cover the
  * correlation structure on random shapes the testbed never produces —
  * single-supplier orders, all-late orders, one-row parts, ties at the
  * threshold, empty selections.
  */
object TpchDecorrelationProperties extends Properties("tpch_decorr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def spark = SparkSuite.spark

  // ---- Q21: EXISTS other-supplier AND NOT EXISTS other-late-supplier ----

  /** (orderkey, status, orderDay); (orderkey, suppkey, shipDay). */
  private val q21Gen: Gen[(Seq[(Long, String, Long)], Seq[(Long, Long, Long)])] =
    for {
      nOrders <- Gen.choose(1, 12)
      orders <- Gen.sequence[Seq[(Long, String, Long)], (Long, String, Long)](
        (1L to nOrders).map { ok =>
          for {
            st <- Gen.oneOf("F", "O", "P")
            day <- Gen.choose(0L, 50L)
          } yield (ok, st, day)
        })
      nLines <- Gen.choose(1, 40)
      lines <- Gen.sequence[Seq[(Long, Long, Long)], (Long, Long, Long)](
        (1 to nLines).map { _ =>
          for {
            ok <- Gen.choose(1L, nOrders.toLong)
            sk <- Gen.choose(1L, 5L)
            ship <- Gen.choose(0L, 250L) // vs orderDay + 120: both sides hit
          } yield (ok, sk, ship)
        })
    } yield (orders, lines)

  /** Driver fold of the textbook: count qualifying late l1 rows per
    * (order, supplier). */
  private def q21Reference(
      orders: Seq[(Long, String, Long)],
      lines: Seq[(Long, Long, Long)]): Map[(Long, Long), Long] = {
    val fOrders = orders.filter(_._2 == "F").map(o => o._1 -> o._3).toMap
    val inF = lines.filter(l => fOrders.contains(l._1))
    def late(l: (Long, Long, Long)): Boolean = l._3 > fOrders(l._1) + 120
    inF.filter { l1 =>
      late(l1) &&
        inF.exists(l2 => l2._1 == l1._1 && l2._2 != l1._2) &&
        !inF.exists(l3 => l3._1 == l1._1 && l3._2 != l1._2 && late(l3))
    }.groupBy(l => (l._1, l._2)).map { case (k, ls) => k -> ls.size.toLong }
  }

  property("q21 window decorrelation == textbook EXISTS/NOT-EXISTS fold") =
    forAll(q21Gen) { case (orders, lines) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val oDf = orders.toDF("o_orderkey", "o_orderstatus", "d")
        .withColumn("o_orderdate", expr("timestamp_seconds(d * 86400)")).drop("d")
      val lDf = lines.toDF("l_orderkey", "l_suppkey", "sd")
        .withColumn("l_shipdate", expr("timestamp_seconds(sd * 86400)")).drop("sd")
      val got = RelationalOps.keptWaitingCore(lDf, oDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      got == q21Reference(orders, lines)
    }

  // ---- Q17: qty < 0.2 * per-part AVG, via the window rewrite ----

  /** (partkey, qty, price cents); selected partkeys. */
  private val q17Gen: Gen[(Seq[(Long, Long, Long)], Seq[Long])] = for {
    nLines <- Gen.choose(1, 50)
    lines <- Gen.sequence[Seq[(Long, Long, Long)], (Long, Long, Long)](
      (1 to nLines).map { _ =>
        for {
          pk <- Gen.choose(1L, 8L)
          q <- Gen.choose(1L, 50L)
          cents <- Gen.choose(100L, 99999L)
        } yield (pk, q, cents)
      })
    selected <- Gen.someOf(1L to 8L)
  } yield (lines, selected.toSeq)

  private def q17Reference(
      lines: Seq[(Long, Long, Long)], pp: Seq[Long]): Map[(Long, Long, Long), Long] = {
    val byPart = lines.groupBy(_._1)
    lines.filter { case (pk, q, _) =>
      pp.contains(pk) && {
        val rows = byPart(pk)
        // qty < 0.2·avg ⟺ 5·qty·n < Σqty — the exact test the core runs
        5L * q * rows.size < rows.map(_._2).sum
      }
    }.groupBy(identity).map { case (k, ls) => k -> ls.size.toLong }
  }

  property("q17 window decorrelation == textbook correlated-AVG fold") =
    forAll(q17Gen) { case (lines, pp) =>
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val lDf = lines.toDF("l_partkey", "q", "cents")
        .withColumn("l_quantity", col("q").cast("double"))
        .withColumn("l_extendedprice", col("cents").cast("double") / 100.0)
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val ppDf = pp.toDF("p_partkey")
      val got = RelationalOps.smallQuantityCore(lDf, ppDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(identity).map { case (k, ls) => k -> ls.size.toLong }
      got == q17Reference(lines, pp)
    }

  // ---- Q20: supplier shipped > 10% of a selected part's total ----

  /** Driver fold over (partkey, suppkey, qty) triples. */
  private def q20Reference(
      lines: Seq[(Long, Long, Long)], pp: Seq[Long]): Set[Long] = {
    val sel = lines.filter(l => pp.contains(l._1))
    val spq = sel.groupBy(l => (l._1, l._2))
      .map { case (k, ls) => k -> ls.map(_._3).sum }
    val tot = spq.groupBy(_._1._1).map { case (pk, m) => pk -> m.values.sum }
    spq.collect { case ((pk, sk), q) if 10L * q > tot(pk) => sk }.toSet
  }

  property("q20 window decorrelation == textbook nested-IN fold") =
    forAll(q17Gen) { case (lines, pp) => // same shape: (partkey, qty→suppkey, cents→qty)
      val triples = lines.map { case (pk, a, b) => (pk, 1L + a % 5L, 1L + b % 50L) }
      val s = spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val lDf = triples.toDF("l_partkey", "l_suppkey", "q")
        .withColumn("l_quantity", col("q").cast("double"))
        .select("l_partkey", "l_suppkey", "l_quantity")
      val ppDf = pp.toDF("p_partkey")
      val got = RelationalOps.excessShipmentsCore(lDf, ppDf)
        .collect().map(_.getLong(0)).toSet
      got == q20Reference(triples, pp)
    }
}
