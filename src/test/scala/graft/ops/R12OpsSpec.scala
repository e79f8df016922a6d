package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-12 additions, checked by
  * driver-side recomputation at sf0.001 — independent of the DuckDB
  * oracle, so a systematic cross-engine bug can't hide a wrong
  * formulation (the R5OpsSpec discipline).
  */
class R12OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val r12Keys = Seq(
    "agg_bool_countif", "q3_shipping_priority", "q18_large_volume",
    "join_exists_flag", "win_ewma_dyadic", "path_trigram_top",
    "mix_upsample_epochs", "vocab_oov_rate", "sample_systematic",
    "harmonize_crosswalk", "dedup_containment",
    "agg_corr_explicit", "event_transition_matrix", "fn_url_parse",
    "knn_holdout_eval", "embed_norm_audit", "stream_rate_alert")

  test("every r12 key is partition-count invariant (the 100 TB correctness property)") {
    val session = spark.conf.get("spark.sql.shuffle.partitions")
    def results(parts: Int): Map[String, Seq[String]] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try r12Keys.map { k =>
        k -> graft.SparkEntry.queries(k)(spark, sf).collect()
          .map(_.toString).toSeq.sorted
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", session)
    }
    val a = results(3); val b = results(17)
    r12Keys.foreach { k =>
      assert(a(k) == b(k), s"$k: result depends on the shuffle partition count")
      assert(a(k).nonEmpty, s"$k: empty result cannot certify anything")
    }
  }

  test("agg_bool_countif: flags and conditional counts recompute in plain JVM logic") {
    val rows = Aggregates.aggBoolCountif.run(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val byPrio = orders.groupBy(_._1)
    assert(rows.keySet == byPrio.keySet)
    byPrio.foreach { case (prio, os) =>
      val r = rows(prio)
      assert(r.getLong(1) == os.length)
      assert(r.getBoolean(2) == os.forall(_._2 < 495000))
      assert(r.getBoolean(3) == os.exists(_._2 > 450000))
      assert(r.getBoolean(4) == os.forall(o => Set("F", "O", "P")(o._3)))
      assert(r.getLong(5) == os.count(_._3 == "F"))
      assert(r.getLong(6) == os.count(_._2 > 450000))
    }
  }

  test("q18_large_volume: every emitted order's recomputed quantity sum exceeds the cut") {
    val rows = Joins.q18LargeVolume.run(spark, sf).collect()
    val sums = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).sum).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ok = r.getLong(2)
      assert(sums(ok) > 250, s"order $ok emitted with sum ${sums(ok)}")
      assert(math.abs(sums(ok) - r.getDouble(5)) < 1e-6)
    }
    val expected = sums.filter(_._2 > 250).keySet
    assert(rows.map(_.getLong(2)).toSet == expected,
      "emitted orders differ from the recomputed heavy-order set")
  }

  test("join_exists_flag: per-nation splits reconcile and match a recomputed mark join") {
    val rows = Joins.joinExistsFlag.run(spark, sf).collect()
    val custByNation = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("c_custkey")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ordersByCust = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1))).toMap
    rows.foreach { r =>
      val (nation, n, high, any, none) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val custs = custByNation(nation)
      assert(n == custs.size)
      assert(any + none == n, s"$nation: with/without split doesn't cover")
      assert(high == custs.count(c =>
        ordersByCust.getOrElse(c, Array.empty[Double]).exists(_ > 450000)))
      assert(any == custs.count(ordersByCust.contains))
    }
  }

  test("win_ewma_dyadic: smoother recomputes from each customer's raw order history") {
    val rows = Windows.winEwmaDyadic.run(spark, sf).collect()
    val hist = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr("cast(cast(o_totalprice as decimal(12,2)) * 100 as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2),
        r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._3.toString, t._2)).map(_._4).toIndexedSeq).toMap
    assert(rows.nonEmpty)
    val emitted = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (ck, cents, ewma) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val series = hist(ck)
      // cents can repeat within a customer; some position with this
      // value must reproduce the emitted trailing-8 dot product
      val i = (7 until series.length).find { j =>
        series(j) == cents &&
          (0 to 7).map(k => series(j - k) * (128L >> k)).sum / 255 == ewma
      }
      assert(i.isDefined, s"cust $ck: no window position reproduces ewma $ewma")
    }
    // row count: every customer contributes max(0, n-7) rows
    val expected = hist.values.map(s => math.max(0, s.length - 7)).sum
    assert(emitted.size == expected)
  }

  test("path_trigram_top: counts recompute from per-user sorted event streams") {
    val rows = EventAnalytics.pathTrigramTop.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val streams = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._3, t._2)).map(_._4).toSeq).toMap
    val all = streams.values.flatMap(_.sliding(3).filter(_.size == 3)
      .map(_.mkString(">"))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // the emitted 20 must agree with recomputed counts and be the true top-20
    rows.foreach { case (p, n) => assert(all(p) == n, s"$p: $n vs ${all(p)}") }
    val top = all.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(rows.toSeq == top)
  }

  test("mix_upsample_epochs: repeat factors derive from counts and epochs are uniform") {
    val rows = PipelineOps.mixUpsampleEpochs.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val counts = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mx = counts.values.max
    counts.foreach { case (lang, cnt) =>
      val rep = math.min(4L, mx / cnt)
      val chars = docs.filter(_._1 == lang).map(_._2).sum
      (1L to rep).foreach { ep =>
        assert(rows((lang, ep)) == ((cnt, chars)),
          s"$lang epoch $ep: every epoch must repeat the class verbatim")
      }
      assert(!rows.contains((lang, rep + 1)), s"$lang: epoch beyond factor $rep")
    }
  }

  test("vocab_oov_rate: OOV mass recomputes against the top-8 vocabulary") {
    val rows = CorpusOps.vocabOovRate.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val corpus = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val vocab = corpus.toSeq.sortBy { case (t, c) => (-c, t) }.take(8).map(_._1).toSet
    docs.foreach { case (id, toks) =>
      val oov = toks.count(t => !vocab(t)).toLong
      assert(rows(id) == ((toks.size.toLong, oov, oov * 1000 / toks.size)),
        s"doc $id: OOV mismatch")
    }
  }

  test("sample_systematic: membership is exactly every 20th rank of the md5 order") {
    val rows = Sampling.sampleSystematic.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val ranked = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._2)).map(_._2).toIndexedSeq)
      .toMap
    val expected = ranked.flatMap { case (src, ids) =>
      ids.zipWithIndex.collect { case (id, i) if i % 20 == 0 => (src, id, i + 1) }
    }.toSet
    assert(rows.toSet == expected)
  }

  test("harmonize_crosswalk: two-hop fallthrough labels partition all customers") {
    val rows = HarmonizeQueries.harmonizeCrosswalk.run(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(rows.values.sum == nCust, "crosswalk drops or duplicates customers")
    assert(rows.keySet == Set("CORE", "GROWTH", "Z4-UNMAPPED", "UNMAPPED"))
  }

  test("agg_corr_explicit: corr matches a direct double-precision recomputation") {
    val rows = Aggregates.aggCorrExplicit.run(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.foreach { r =>
      val (flag, n, corr) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val xs = li.filter(_._1 == flag)
      assert(n == xs.length)
      val x = xs.map(_._2); val y = xs.map(_._3)
      val mx = x.sum / n; val my = y.sum / n
      val cov = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum / n
      val sx = math.sqrt(x.map(a => (a - mx) * (a - mx)).sum / n)
      val sy = math.sqrt(y.map(b => (b - my) * (b - my)).sum / n)
      // the graded value uses exact integer power sums; a naive float
      // recomputation agrees to ~1e-6 relative
      assert(math.abs(corr - cov / (sx * sy)) < 1e-6,
        s"$flag: corr $corr vs recomputed ${cov / (sx * sy)}")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("event_transition_matrix: rows normalize to ≤1e6 ppm per from-state") {
    val rows = EventAnalytics.eventTransitionMatrix.run(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byFrom = rows.groupBy(_._1)
    byFrom.foreach { case (from, rs) =>
      val tot = rs.head._4
      assert(rs.map(_._3).sum == tot, s"$from: counts don't sum to the marginal")
      val ppmSum = rs.map(_._5).sum
      // floor-ppm rows sum to ≤ 1e6 and within |to-states| of it
      assert(ppmSum <= 1000000L && ppmSum > 1000000L - rs.length,
        s"$from: ppm sum $ppmSum")
      rs.foreach { t => assert(t._5 == t._3 * 1000000L / tot) }
    }
  }

  test("fn_url_parse: parsed components reassemble into the original url") {
    val rows = Functions.fnUrlParse.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (url, host, path, query, kParam, frag) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4),
          r.getString(5), r.getString(6))
      assert(url == s"https://$host$path?$query#$frag")
      assert(query.contains(s"k=$kParam"))
      assert(host.startsWith("www.shop-") && host.endsWith(".example.com"))
    }
  }

  test("knn_holdout_eval: confusion matrix covers every holdout vector exactly once") {
    val rows = LlmExtras.knnHoldoutEval.run(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val holdout = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0).select(col("label")).collect()
      .map(_.getInt(0))
    assert(rows.map(_._3).sum == holdout.length,
      "every holdout vector must be classified exactly once")
    val actualTotals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val holdoutByLabel = holdout.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(actualTotals == holdoutByLabel,
      "per-actual-label totals must match the holdout composition")
  }

  test("embed_norm_audit: norm² recomputes from raw components per label") {
    val rows = PipelineOps.embedNormAudit.run(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val norm2 = vecs.map { case (l, e) =>
      (l, e.map(x => { val m = math.floor(x.toDouble * 1000 + 0.5).toLong; m * m }).sum)
    }
    val byLabel = norm2.groupBy(_._1)
    assert(rows.keySet == byLabel.keySet)
    byLabel.foreach { case (l, ns) =>
      val (n, mn, mx) = rows(l)
      assert(n == ns.length)
      assert(mn == ns.map(_._2).min && mx == ns.map(_._2).max)
    }
  }

  test("stream_rate_alert: alerts recompute from per-type window series") {
    val rows = Streaming.streamRateAlert.run(spark, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val series = rs.sortBy(_._2)
      assert(series.head._4 == -1L, "first window must have no predecessor")
      series.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur._4 == prev._3, "prev column must equal the previous window's n")
          assert(cur._5 == (cur._3 > 2 * prev._3))
        case _ =>
      }
    }
  }

  test("dedup_containment: containment pairs recompute from raw token sets") {
    val rows = LlmPipeline.dedupContainment.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSet))
    val pairs = for {
      (ida, la, ta) <- docs
      (idb, lb, tb) <- docs
      if la == lb && ida < idb && ta.size != tb.size &&
        ((ta subsetOf tb) || (tb subsetOf ta))
    } yield if (ta.size >= tb.size) (ida, idb) else (idb, ida)
    val expected = pairs.groupBy(_._1).view.mapValues { ps =>
      val contained = ps.map(_._2)
      (contained.size.toLong, contained.min, contained.max)
    }.toMap
    assert(rows == expected)
  }
}
