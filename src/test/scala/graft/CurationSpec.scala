package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.streaming.EventStream

/** Brute-force model replays for the round-11 curation batch
  * (q496–q500): each declared query is recomputed in plain Scala from
  * the collected sf0.001 tables and compared field-exactly — the house
  * spec discipline (the differential proves Spark = DuckDB; these
  * prove both = the algorithm as independently written). */
class CurationSpec extends SparkSpec {

  private val P = 2147483647L
  private val A = 1103515245L
  private val B = 12345L

  private def rho25(v: Long): Int = {
    var r = 1
    var bit = 1L << 24
    while (bit > 0 && (v & bit) == 0) { r += 1; bit >>= 1 }
    if (v == 0) 26 else r
  }

  /** Scala HLL model: (type → registers) from raw events. */
  private def hllModel(): Map[String, (Long, Long, Long)] = {
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    ev.groupBy(_._1).map { case (tpe, rows) =>
      val regs = scala.collection.mutable.Map[Long, Int]()
      rows.foreach { case (_, uid) =>
        val h = (A * uid + B) % P
        val reg = h % 64
        val r = rho25(h / 64)
        if (r > regs.getOrElse(reg, 0)) regs(reg) = r
      }
      val nRegs = regs.size.toLong
      val sInt = regs.values.map(m => 1L << (25 - m)).sum +
        (64 - nRegs) * 33554432L
      val est = math.floor(
        97491078487.97049 / sInt.toDouble * 1000).toLong
      tpe -> ((nRegs, sInt, est))
    }
  }

  test("q496 registers, S_int and estimate replay the scala HLL model " +
    "exactly") {
    val model = hllModel()
    val got = Curation.q496HllDistinct(spark, sf1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === model.keySet)
    got.foreach { case (tpe, sketch) =>
      assert(sketch === model(tpe),
        s"$tpe sketch diverged from the scala model")
    }
  }

  test("q496 raw estimate lands within 30% of exact at sf0.01 " +
    "(n ≈ 2.3·m — the declared no-small-range-correction contract " +
    "means sf0.001's n ≪ m IS biased, by design; this pins the regime " +
    "the scaladoc claims honest)") {
    Curation.q496HllDistinct(spark, "/root/testdata/sf0.01").collect()
      .foreach { r =>
        val (nExact, est) = (r.getLong(1), r.getLong(4))
        assert(math.abs(est - 1000L * nExact) <= 300L * nExact,
          s"${r.getString(0)} estimate ${est / 1000.0} vs exact " +
            s"$nExact out of the 30% band")
      }
  }

  test("q500 streamed sketch equals the q496 batch sketch columns") {
    val batch = Curation.q496HllDistinct(spark, sf1)
      .select("event_type", "n_regs", "s_int", "est_milli")
      .collect().map(_.toString).sorted.toSeq
    val streamed = EventStream.q500StreamHll(spark, sf1)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }

  test("q497 pass@k replays an exact BigInt binomial model per segment") {
    val orders = graft.sources.Tables.load(spark, sf1, "orders")
      .select("o_custkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cust = graft.sources.Tables.load(spark, sf1, "customer")
      .select("c_custkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def binom(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0L until k).map(i => BigInt(n - i)).product /
        (1L to k).map(BigInt(_)).product
    val perSeg = orders.groupBy(_._1).toSeq.flatMap { case (ck, rows) =>
      val n = rows.size.toLong
      val c = rows.count(_._2 == "1-URGENT").toLong
      if (n < 10) None else Some((cust(ck), n, c))
    }.groupBy(_._1)
    // the declared int→double exactness bound: (n)₁₀ stays < 2⁵³ iff
    // n ≤ 44 ((44)₁₀ = 9.004·10¹⁵ < 2⁵³ < (45)₁₀ = 1.158·10¹⁶) — the
    // data's Poisson order-count tail must stay under it at this SF,
    // and at sf0.01 too (the correctness-gate SF; observed max 25)
    assert(orders.groupBy(_._1).values.map(_.size).max <= 44)
    locally {
      val o01 = graft.sources.Tables
        .load(spark, "/root/testdata/sf0.01", "orders")
        .groupBy("o_custkey").count()
        .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      assert(o01 <= 44)
    }
    val expected = perSeg.map { case (seg, tasks) =>
      def meanPpm(k: Long): Long = {
        val ppms = tasks.map { case (_, n, c) =>
          if (n - c < k) 1000000L
          else {
            // the declared estimator: int64 products cast to double,
            // ONE division — replay with the same arithmetic
            val num = (0L until k).map(i => n - c - i).product.toDouble
            val den = (0L until k).map(i => n - i).product.toDouble
            1000000L - math.floor(num / den * 1000000).toLong
          }
        }
        ppms.sum / ppms.size
      }
      // cross-check the falling-factorial form IS the binomial ratio
      tasks.foreach { case (_, n, c) =>
        val ff = (0L until 5L).map(i => BigInt(n - c - i)).product
        val ffd = (0L until 5L).map(i => BigInt(n - i)).product
        if (n - c >= 5)
          assert(ff * binom(n, 5) === binom(n - c, 5) * ffd)
      }
      seg -> ((tasks.size.toLong, meanPpm(1), meanPpm(5), meanPpm(10)))
    }
    val got = Curation.q497PassAtK(spark, sf1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === expected)
  }

  test("q498 split gains replay the exact-integer Gini model and the " +
    "chosen flag marks the argmax") {
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("text", "lang", "n_chars", "source")
      .collect().map(r => (r.getString(0).split(" ").contains("dup"),
        r.getString(1), r.getLong(2), r.getString(3)))
    val n = docs.size.toLong
    val pos = docs.count(_._1).toLong
    def gini(p: Long, m: Long): Long =
      if (m == 0) 0L else 2 * p * (m - p) * 1000000L / (m * m)
    val feats = Seq[(String, ((Boolean, String, Long, String)) => Boolean)](
      ("lang_en", _._2 == "en"),
      ("len_300", _._3 >= 300),
      ("src_low", d => (0 to 9).map("src" + _).contains(d._4)))
    val model = feats.map { case (name, pred) =>
      val nL = docs.count(pred).toLong
      val posL = docs.count(d => pred(d) && d._1).toLong
      val gain =
        if (nL == 0 || nL == n) 0L
        else gini(pos, n) -
          (nL * gini(posL, nL) + (n - nL) * gini(pos - posL, n - nL)) / n
      name -> ((nL, posL, gain))
    }.toMap
    val bestGain = model.values.map(_._3).max
    val bestName = model.filter(_._2._3 == bestGain).keys.max
    val got = Curation.q498SplitGain(spark, sf1).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === model.keySet)
    model.foreach { case (name, (nL, posL, gain)) =>
      val chosen = if (name == bestName) 1L else 0L
      assert(got(name) === ((nL, posL, gain, chosen)),
        s"$name diverged from the scala Gini model")
    }
  }

  test("q504 set algebra replays the scala model and the union sketch " +
    "IS the elementwise register max (the defining merge law)") {
    val ev = graft.sources.Tables.load(spark, sf1, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .filter(e => e._1 == "click" || e._1 == "purchase")
    def regsOf(rows: Seq[Long]): Map[Long, Int] = {
      val m = scala.collection.mutable.Map[Long, Int]()
      rows.foreach { uid =>
        val h = (A * uid + B) % P
        val r = rho25(h / 64)
        if (r > m.getOrElse(h % 64, 0)) m(h % 64) = r
      }
      m.toMap
    }
    val clicks = ev.filter(_._1 == "click").map(_._2)
    val purch = ev.filter(_._1 == "purchase").map(_._2)
    val rc = regsOf(clicks)
    val rp = regsOf(purch)
    val ru = regsOf(clicks ++ purch)
    // merge law: sketch(A ∪ B) = elementwise max of the two sketches
    assert(ru === (rc.keySet ++ rp.keySet).map(k =>
      k -> math.max(rc.getOrElse(k, 0), rp.getOrElse(k, 0))).toMap)
    def sInt(m: Map[Long, Int]): Long =
      m.values.map(x => 1L << (25 - x)).sum + (64 - m.size) * 33554432L
    def est(s: Long): Long =
      math.floor(97491078487.97049 / s.toDouble * 1000).toLong
    val r = Curation.q504HllSetAlgebra(spark, sf1).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === est(sInt(rc)))
    assert(row.getLong(1) === est(sInt(rp)))
    assert(row.getLong(2) === est(sInt(ru)))
    assert(row.getLong(3) ===
      est(sInt(rc)) + est(sInt(rp)) - est(sInt(ru)))
    assert(row.getLong(4) === clicks.distinct.size.toLong)
    assert(row.getLong(5) === purch.distinct.size.toLong)
    assert(row.getLong(6) === (clicks ++ purch).distinct.size.toLong)
    assert(row.getLong(7) ===
      clicks.distinct.toSet.intersect(purch.distinct.toSet).size.toLong)
  }

  test("q505 streamed split-gain monitor equals the q498 batch table") {
    val batch = Curation.q498SplitGain(spark, sf1)
      .collect().map(_.toString).sorted.toSeq
    val streamed = EventStream.q505StreamSplitGain(spark, sf1)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }

  test("q513 DSIR weights replay the exact rational model and respect " +
    "the target-subset ratio bound") {
    val rows = Curation.q513DsirWeights(spark, sf1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_toks"), r.getAs[Long]("weight"),
          r.getAs[Long]("wpt_ppm"))).toMap
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val Mod = 1000000007L
    def charFold(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Mod)
    val nb = Curation.DsirBuckets
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ").filter(_.nonEmpty)
        .map(w => (id, lang, charFold(w) % nb))
    }
    val rN = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val tN = toks.filter(_._2 == "en").groupBy(_._3).view
      .mapValues(_.length.toLong).toMap
    val rr = toks.length.toLong
    val tt = toks.count(_._2 == "en").toLong
    val ratio = rN.map { case (b, r) =>
      val t = tN.getOrElse(b, 0L)
      assert(t <= r, s"bucket $b target exceeds raw")
      b -> (BigInt(t + 1) * (rr + nb) * 1000000 /
        (BigInt(r + 1) * (tt + nb))).toLong
    }
    // the subset bound: every ratio ≤ (R+|B|)·10⁶/(T+|B|)
    val cap = (BigInt(rr + nb) * 1000000 / BigInt(tt + nb)).toLong
    ratio.values.foreach(v => assert(v <= cap))
    val model = toks.groupBy(_._1).map { case (id, ts) =>
      val w = ts.map(t => ratio(t._3)).sum
      id -> (ts.length.toLong, w, w / ts.length)
    }
    assert(rows === model)
    // docs with zero tokens release no row
    assert(rows.keySet === docs.filter(_._3.split(" ")
      .exists(_.nonEmpty)).map(_._1).toSet)
  }

  test("q499 allocation replays the integer Chinchilla model and the " +
    "global budget inverts the FLOPs sum") {
    val docs = graft.sources.Tables.load(spark, sf1, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").length.toLong))
    val model = docs.groupBy(_._1).map { case (src, rows) =>
      val d = rows.map(_._2).sum
      val nOpt = d / 20
      src -> ((d, nOpt, 6 * nOpt * d))
    }
    val fTotal = model.values.map(_._3).sum
    val nBudget = math.floor(math.sqrt(fTotal.toDouble / 120.0)).toLong
    val got = Curation.q499ChinchillaSplit(spark, sf1).collect()
    assert(got.map(_.getString(0)).toSet === model.keySet)
    got.foreach { r =>
      val (d, nOpt, flops) = model(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((d, nOpt, flops)))
      assert(r.getLong(4) === fTotal && r.getLong(5) === nBudget &&
        r.getLong(6) === 20 * nBudget)
    }
    // the budget model is self-consistent: 120·N² ≤ ΣC < 120·(N+1)²
    assert(120 * nBudget * nBudget <= fTotal &&
      fTotal < 120 * (nBudget + 1) * (nBudget + 1))
  }
}
