package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the r18b batch, checked by FULL driver-side
  * recomputation at sf0.001 — independent of the DuckDB oracle: the
  * Gopher rule census and padding sweep are replayed from raw
  * document strings, Jarque–Bera from BigInt power sums through the
  * same one float tree, Kruskal–Wallis from a plain-Scala sort-based
  * midrank assignment (NOT the prefix-pass spelling — an independent
  * derivation of the same ranks), and the trimmed mean from a full
  * sort-and-slice (NOT the histogram-overlap spelling). */
class R18bOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def cents2(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100)
      .toLongExact

  private def cents4(v: Double): Long =
    (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * 100)
      .setScale(0, BigDecimal.RoundingMode.DOWN).toLongExact

  private lazy val docRows: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"),
        col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("text_gopher_rules: all four rules replayed from raw strings") {
    val stop = Set("a", "row", "join", "filter", "stream")
    val flags = docRows.map { case (_, text, source) =>
      val ts = text.split(" ", -1)
      val ntok = ts.length.toLong
      val sumchars = text.count(_ != ' ').toLong
      val nstop = ts.toSet.intersect(stop).size
      val toks = ts.filter(_.nonEmpty)
      val maxc = if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.length).max.toLong
      val r1 = ntok >= 20 && ntok <= 180
      val r2 = sumchars * 1000 >= 3800 * ntok && sumchars * 1000 <= 5000 * ntok
      val r3 = nstop >= 2
      val r4 = maxc * 5 <= ntok
      (source, r1, r2, r3, r4, toks.nonEmpty)
    }
    // docs with no nonempty token drop through the inner maxc join
    val kept = flags.filter(_._6)
    val expect = kept.groupBy(_._1).toSeq.map { case (src, xs) =>
      def c(f: ((String, Boolean, Boolean, Boolean, Boolean, Boolean))
          => Boolean) = xs.count(f).toLong
      val all = c(x => x._2 && x._3 && x._4 && x._5)
      (src, xs.length.toLong, c(_._2), c(_._3), c(_._4), c(_._5), all,
        all * 1000000L / xs.length)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("text_gopher_rules")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == expect)
    // the rules must discriminate at this tier: neither vacuous nor
    // absolute for the all-rules census
    val totAll = expect.map(_._7).sum
    val totDocs = expect.map(_._2).sum
    assert(totAll > 0 && totAll < totDocs)
  }

  test("pack_padding_waste_sweep: chunk arithmetic replayed") {
    val ntoks = docRows.map(_._2.split(" ", -1).length.toLong)
    val expect = Seq(64L, 128L, 256L).map { l =>
      val chunks = ntoks.map(n => (n + l - 1) / l)
      val padded = chunks.map(_ * l).sum
      (l, ntoks.length.toLong, ntoks.sum, chunks.sum, padded,
        (padded - ntoks.sum) * 1000000L / padded)
    }
    val got = graft.SparkEntry.queries("pack_padding_waste_sweep")(
      spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
    // waste must shrink monotonically as context length drops
    assert(expect.map(_._6) == expect.map(_._6).sorted)
  }

  test("stats_jarque_bera: BigInt power sums through the one float " +
      "tree") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), cents4(r.getDouble(1)))).toSeq
    val expect = ev.groupBy(_._1).toSeq.map { case (t, xs) =>
      val n = BigInt(xs.length)
      val v = xs.map(x => BigInt(x._2))
      val s1 = v.sum; val s2 = v.map(x => x * x).sum
      val s3 = v.map(x => x * x * x).sum; val s4 = v.map(x => x * x * x * x).sum
      val a2 = n * s2 - s1 * s1
      val a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
      val a4 = n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1
      val d2 = a2.toDouble; val d3 = a3.toDouble; val d4 = a4.toDouble
      val skewSq = d3 * d3 / (d2 * d2 * d2)
      val kurt = d4 / (d2 * d2)
      val jb = n.toDouble * (skewSq + (kurt - 3) * (kurt - 3) / 4) / 6
      (t, xs.length.toLong, math.floor(skewSq * 1000000).toLong,
        math.floor(kurt * 1000000).toLong,
        math.floor(jb * 1000000).toLong,
        math.floor(jb * 1000000).toLong > 5991465L)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("stats_jarque_bera")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == expect)
    // kurtosis of any real distribution is positive
    assert(expect.forall(_._4 > 0))
  }

  test("stats_kruskal_wallis: sort-based midranks, independent of the " +
      "prefix-pass spelling") {
    val pri = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), cents2(r.getDouble(1)))).toSeq
    // doubled midranks by value: positions pre+1..pre+cnt share
    // doubled midrank 2*pre + cnt + 1
    val byV = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var pre = 0L
    val dmid = scala.collection.mutable.Map[Long, Long]()
    var tie = BigInt(0)
    byV.foreach { case (v, xs) =>
      val cnt = xs.length.toLong
      dmid(v) = 2 * pre + cnt + 1
      tie += BigInt(cnt) * cnt * cnt - cnt
      pre += cnt
    }
    val n = BigInt(rows.length)
    val r2 = pri.map(p => rows.filter(_._1 == p)
      .map(x => BigInt(dmid(x._2))).sum)
    val ns = pri.map(p => BigInt(rows.count(_._1 == p)))
    val q = r2.zip(ns).map { case (r, ng) =>
      if (ng == 0) BigInt(0) else r * r / ng }.sum
    val hMicro = (BigInt(3000000) * q / (n * (n + 1)) -
      BigInt(3000000) * (n + 1)).toLong
    val den = n * n * n - n - tie
    val hc = (BigInt(hMicro) * (n * n * n - n) / den).toLong
    val got = graft.SparkEntry.queries("stats_kruskal_wallis")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getBoolean(9))).toSeq
    val expect = Seq((n.toLong, ns(0).toLong, ns(1).toLong, ns(2).toLong,
      ns(3).toLong, ns(4).toLong, hMicro, tie.toLong, hc,
      hc > 9487729L))
    assert(got == expect)
    // H is nonnegative up to the 5 per-group floor steps
    assert(hMicro >= -5L * 3000000 / (n * (n + 1)).toLong - 1)
  }

  test("agg_trimmed_mean: full sort-and-slice, independent of the " +
      "histogram-overlap spelling") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), cents2(r.getDouble(1)))).toSeq
    val expect = rows.groupBy(_._1).toSeq.map { case (f, xs) =>
      val vs = xs.map(_._2).sorted
      val n = vs.length.toLong
      val k = n / 10
      val kept = vs.slice(k.toInt, (n - k).toInt)
      val sall = vs.map(BigInt(_)).sum
      val skept = kept.map(BigInt(_)).sum
      (f, n, k, (sall / n).toLong, (skept / (n - 2 * k)).toLong)
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("agg_trimmed_mean")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // trimming a right-skewed money column must not RAISE the mean
    // by much; sanity: trimmed mean within 50% of the mean
    expect.foreach { e =>
      assert(math.abs(e._5 - e._4) * 2 <= e._4, s"implausible trim: $e")
    }
  }
}
