package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-18 continuation batch. Training-data curation depth (the
  * Gopher rule census, padding-waste planning), the remaining
  * classical nonparametric/distribution tests a data-quality deck
  * publishes (Kruskal–Wallis, Jarque–Bera), and robust reporting
  * (trimmed mean via the bucketed-prefix rank primitive — never a
  * whole-group sort). House protocol throughout: exact integers end
  * to end, one identical float tree where a moment ratio is
  * unavoidable, guarded denominators, broadcast tiny sides,
  * partitioned (and bucketed) windows only. */
object R18bOps {

  private val dec = DecimalType(38, 0)

  /** Gopher-style quality-rule census (r18b) — the rule-based
    * pre-filter every LLM corpus pass runs before model-based
    * scoring (Rae et al. 2021's repetition/length/stopword
    * heuristics, re-expressed on the fixture corpus): R1 token count
    * in [20, 180]; R2 mean token length in [3.8, 5.0] (chars×1000
    * vs ntok, exact cross-multiplication — no division); R3 at
    * least TWO distinct stop tokens from the 5-word function list;
    * R4 top-token dominance ≤ 20% (max per-doc term count ×5 ≤
    * ntok). Graded per source: per-rule pass counts, all-rules pass
    * count and floor-ppm — the per-lineage yield table that decides
    * which upstream feed needs attention. Cost: one (doc, tok)
    * count shuffle + one doc-keyed max + a source-sized fold; the
    * row-local rules ride the scan. At 100 TB each rule stays a
    * map-side expression; only the term-dominance rule pays a
    * shuffle, bounded by corpus token count. */
  val textGopherRules: QDef = q(
    "text_gopher_rules",
    """WITH s AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS sumchars,
      |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
      |      ['a', 'row', 'join', 'filter', 'stream'])) AS BIGINT) AS nstop
      |  FROM documents),
      |tc AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY doc_id, tok),
      |mx AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS maxc
      |  FROM tc GROUP BY doc_id),
      |f AS (
      |  SELECT s.source,
      |    CASE WHEN s.ntok BETWEEN 20 AND 180 THEN 1 ELSE 0 END AS r1,
      |    CASE WHEN s.sumchars * 1000 >= 3800 * s.ntok
      |      AND s.sumchars * 1000 <= 5000 * s.ntok THEN 1 ELSE 0 END AS r2,
      |    CASE WHEN s.nstop >= 2 THEN 1 ELSE 0 END AS r3,
      |    CASE WHEN mx.maxc * 5 <= s.ntok THEN 1 ELSE 0 END AS r4
      |  FROM s JOIN mx ON mx.doc_id = s.doc_id)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(r1) AS BIGINT) AS pass_len,
      |  CAST(SUM(r2) AS BIGINT) AS pass_wordlen,
      |  CAST(SUM(r3) AS BIGINT) AS pass_stop,
      |  CAST(SUM(r4) AS BIGINT) AS pass_rep,
      |  CAST(SUM(r1 * r2 * r3 * r4) AS BIGINT) AS pass_all,
      |  CAST(SUM(r1 * r2 * r3 * r4) * 1000000 // COUNT(*) AS BIGINT)
      |    AS pass_all_ppm
      |FROM f GROUP BY source ORDER BY source""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("ntok"),
      length(translate(col("text"), " ", "")).cast(LongType).as("sumchars"),
      size(array_intersect(array_distinct(split(col("text"), " ")),
        array(lit("a"), lit("row"), lit("join"), lit("filter"),
          lit("stream")))).cast(LongType).as("nstop"))
    val mx = docs
      .select(col("doc_id").as("m_doc"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("m_doc"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("m_doc")).agg(max(col("c")).as("maxc"))
    val f = base.join(mx, col("m_doc") === col("doc_id"))
      .select(col("source"),
        when(col("ntok").between(20, 180), 1L).otherwise(0L).as("r1"),
        when(col("sumchars") * 1000 >= col("ntok") * 3800 &&
          col("sumchars") * 1000 <= col("ntok") * 5000, 1L).otherwise(0L)
          .as("r2"),
        when(col("nstop") >= 2, 1L).otherwise(0L).as("r3"),
        when(col("maxc") * 5 <= col("ntok"), 1L).otherwise(0L).as("r4"))
    f.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("r1")).as("pass_len"), sum(col("r2")).as("pass_wordlen"),
        sum(col("r3")).as("pass_stop"), sum(col("r4")).as("pass_rep"),
        sum(col("r1") * col("r2") * col("r3") * col("r4")).as("pass_all"))
      .select(col("source"), col("n_docs"), col("pass_len"),
        col("pass_wordlen"), col("pass_stop"), col("pass_rep"),
        col("pass_all"),
        expr("pass_all * 1000000 div n_docs").as("pass_all_ppm"))
      .orderBy(col("source"))
  }

  /** Sequence-packing padding-waste sweep (r18b) — the capacity
    * question asked before every pretraining run: at context length
    * L, how many tokens does naive per-document chunk-and-pad burn?
    * For L ∈ {64, 128, 256}: chunks = ⌈ntok/L⌉, padded = chunks·L,
    * waste = padded − ntok; graded per L as doc/chunk/token totals
    * and floor-ppm waste share — the number that justifies a packed
    * loader (`pack_sequences`) over naive padding. Entirely
    * row-local until one 3-group fold; the L sweep is a broadcast
    * 3-row cross join, so at 100 TB this is a single map-side pass.
    * Token count = whitespace split length (FIXTURES.md: the corpus
    * tokenizes cleanly on single spaces). */
  val packPaddingWasteSweep: QDef = q(
    "pack_padding_waste_sweep",
    """WITH t AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |l AS (SELECT CAST(unnest([64, 128, 256]) AS BIGINT) AS max_len),
      |w AS (
      |  SELECT l.max_len, t.ntok,
      |    (t.ntok + l.max_len - 1) // l.max_len AS chunks
      |  FROM t CROSS JOIN l)
      |SELECT max_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ntok) AS BIGINT) AS total_tokens,
      |  CAST(SUM(chunks) AS BIGINT) AS total_chunks,
      |  CAST(SUM(chunks * max_len) AS BIGINT) AS total_padded,
      |  CAST(SUM(chunks * max_len - ntok) * 1000000
      |    // SUM(chunks * max_len) AS BIGINT) AS waste_ppm
      |FROM w GROUP BY max_len ORDER BY max_len""") { (s, d) =>
    import s.implicits._
    val t = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast(LongType).as("ntok"))
    val l = Seq(64L, 128L, 256L).toDF("max_len")
    t.crossJoin(broadcast(l))
      .withColumn("chunks", expr("(ntok + max_len - 1) div max_len"))
      .groupBy(col("max_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
        sum(col("chunks")).as("total_chunks"),
        sum(col("chunks") * col("max_len")).as("total_padded"),
        sum(col("chunks") * col("max_len") - col("ntok")).as("waste"))
      .select(col("max_len"), col("n_docs"), col("total_tokens"),
        col("total_chunks"), col("total_padded"),
        expr("waste * 1000000 div total_padded").as("waste_ppm"))
      .orderBy(col("max_len"))
  }

  /** Jarque–Bera normality test (r18b) — does the per-type event
    * value LOOK normal? The moment-based omnibus test (Jarque &
    * Bera 1980): JB = n/6·(S² + (K−3)²/4) from skewness S and
    * kurtosis K. All four raw power sums are EXACT (cents⁴ through
    * DECIMAL(38) partials), the n-scaled central moments
    * A2 = n·Σx²−(Σx)², A3 = n²Σx³−3nΣxΣx²+2(Σx)³,
    * A4 = n³Σx⁴−4n²ΣxΣx³+6n(Σx)²Σx²−3(Σx)⁴ are exact integer
    * algebra (S² = A3²/A2³ and K = A4/A2² — the n powers cancel),
    * and ONLY the final ratios go through one identical float tree
    * (floor micro). A2 = 0 (constant column) guards to NULL. One
    * grouped agg + row-local algebra — two exchanges, constant
    * output. Scale note: (Σx)⁴ bounds the DECIMAL(38) headroom at
    * ~10⁹ rows × 10⁴ cents; beyond that, pre-divide by n inside
    * the fold. χ²₂ 5%-critical 5.991465 pins `significant`. */
  val statsJarqueBera: QDef = q(
    "stats_jarque_bera",
    """WITH x AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS v
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v) AS HUGEINT) AS s1,
      |    CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2,
      |    CAST(SUM(CAST(v AS HUGEINT) * v * v) AS HUGEINT) AS s3,
      |    CAST(SUM(CAST(v AS HUGEINT) * v * v * v) AS HUGEINT) AS s4
      |  FROM x GROUP BY event_type),
      |a AS (
      |  SELECT event_type, n,
      |    n * s2 - s1 * s1 AS a2,
      |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS a3,
      |    n * n * n * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2
      |      - 3 * s1 * s1 * s1 * s1 AS a4
      |  FROM m)
      |SELECT event_type, n,
      |  CASE WHEN a2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)
      |      / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))
      |      * 1000000) AS BIGINT) END AS skew_sq_micro,
      |  CASE WHEN a2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(a4 AS DOUBLE)
      |      / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) * 1000000)
      |      AS BIGINT) END AS kurt_micro,
      |  CASE WHEN a2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(n AS DOUBLE)
      |      * (CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)
      |          / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE))
      |        + (CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE)) - 3)
      |          * (CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE)) - 3) / 4) / 6 * 1000000)
      |      AS BIGINT) END AS jb_micro,
      |  CASE WHEN a2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(n AS DOUBLE)
      |      * (CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)
      |          / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE))
      |        + (CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE)) - 3)
      |          * (CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE)
      |            * CAST(a2 AS DOUBLE)) - 3) / 4) / 6 * 1000000)
      |      AS BIGINT) > 5991465 END AS significant
      |FROM a ORDER BY event_type""") { (s, d) =>
    val x = Tables.events(s, d).select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("v"))
    val m = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("s1"),
        sum(col("v").cast(dec) * col("v")).as("s2"),
        sum(col("v").cast(dec) * col("v") * col("v")).as("s3"),
        sum(col("v").cast(dec) * col("v") * col("v") * col("v")).as("s4"))
    val a = m.select(col("event_type"), col("n"),
      expr("CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1").as("a2"),
      expr("CAST(n AS DECIMAL(38,0)) * n * s3"
        + " - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2"
        + " + 2 * s1 * s1 * s1").as("a3"),
      expr("CAST(n AS DECIMAL(38,0)) * n * n * s4"
        + " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3"
        + " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2"
        + " - 3 * s1 * s1 * s1 * s1").as("a4"))
    // the ONE float tree, spelled identically to the oracle
    val jbTree = "CAST(n AS DOUBLE)" +
      " * (CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)" +
      " / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))" +
      " + (CAST(a4 AS DOUBLE) / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE))" +
      " - 3) * (CAST(a4 AS DOUBLE)" +
      " / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) - 3) / 4) / 6" +
      " * 1000000"
    a.select(col("event_type"), col("n"),
        when(col("a2") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(FLOOR(CAST(a3 AS DOUBLE) * CAST(a3 AS DOUBLE)"
            + " / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)"
            + " * CAST(a2 AS DOUBLE)) * 1000000) AS BIGINT)"))
          .as("skew_sq_micro"),
        when(col("a2") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(FLOOR(CAST(a4 AS DOUBLE)"
            + " / (CAST(a2 AS DOUBLE) * CAST(a2 AS DOUBLE)) * 1000000)"
            + " AS BIGINT)")).as("kurt_micro"),
        when(col("a2") === 0, lit(null).cast(LongType))
          .otherwise(expr(s"CAST(FLOOR($jbTree) AS BIGINT)")).as("jb_micro"),
        when(col("a2") === 0, lit(null).cast(BooleanType))
          .otherwise(expr(s"CAST(FLOOR($jbTree) AS BIGINT) > 5991465"))
          .as("significant"))
      .orderBy(col("event_type"))
  }

  /** Kruskal–Wallis H test (r18b) — does order value differ across
    * the five order priorities, without assuming normality? The
    * k-group generalization of the graded `stats_mannwhitney_u`,
    * sharing its EXACT doubled-midrank machinery: per-value group
    * counts, the bucketed exclusive-prefix rank pass
    * (`DriftOps.exclusivePrefix` — ONE spelling), doubled rank sums
    * 2R_g = Σ_v c_gv·(2·pre_v + cnt_v + 1), then
    * H = 3/(N(N+1))·Σ(2R_g)²/n_g − 3(N+1) where each (2R_g)²/n_g is
    * a FLOORED exact integer division (error < 5 absolute before
    * the micro scaling — quantization, not float drift, identical
    * in both engines). Tie correction C = 1 − Σ(t³−t)/(N³−N)
    * applied as one more exact rational. NO floats anywhere. χ²₄
    * 5%-critical 9.487729 pins `significant`. Shuffles: one
    * distinct-value histogram, the bucketed-prefix pass, one fold —
    * all value-histogram-sized. */
  val statsKruskalWallis: QDef = q(
    "stats_kruskal_wallis",
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      AS v,
      |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c2,
      |    CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c3,
      |    CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1
      |      ELSE 0 END) AS BIGINT) AS c4,
      |    CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0
      |      END) AS BIGINT) AS c5,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY 1),
      |cum AS (
      |  SELECT *, CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS pre
      |  FROM c),
      |r AS (
      |  SELECT
      |    CAST(SUM(c1 * (2 * pre + cnt + 1)) AS HUGEINT) AS r1,
      |    CAST(SUM(c2 * (2 * pre + cnt + 1)) AS HUGEINT) AS r2,
      |    CAST(SUM(c3 * (2 * pre + cnt + 1)) AS HUGEINT) AS r3,
      |    CAST(SUM(c4 * (2 * pre + cnt + 1)) AS HUGEINT) AS r4,
      |    CAST(SUM(c5 * (2 * pre + cnt + 1)) AS HUGEINT) AS r5,
      |    CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
      |    CAST(SUM(c3) AS BIGINT) AS n3, CAST(SUM(c4) AS BIGINT) AS n4,
      |    CAST(SUM(c5) AS BIGINT) AS n5,
      |    CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT)
      |      AS tie
      |  FROM cum),
      |h AS (
      |  SELECT n, n1, n2, n3, n4, n5, tie,
      |    CAST(3000000 * (
      |        CASE WHEN n1 = 0 THEN 0 ELSE r1 * r1 // n1 END
      |      + CASE WHEN n2 = 0 THEN 0 ELSE r2 * r2 // n2 END
      |      + CASE WHEN n3 = 0 THEN 0 ELSE r3 * r3 // n3 END
      |      + CASE WHEN n4 = 0 THEN 0 ELSE r4 * r4 // n4 END
      |      + CASE WHEN n5 = 0 THEN 0 ELSE r5 * r5 // n5 END)
      |      // (n * (n + 1)) - 3000000 * (n + 1) AS BIGINT) AS h_micro
      |  FROM r)
      |SELECT n, n1, n2, n3, n4, n5, h_micro,
      |  CAST(tie AS BIGINT) AS tie_mass,
      |  CASE WHEN CAST(n AS HUGEINT) * n * n - n - tie = 0 THEN NULL
      |    ELSE CAST(CAST(h_micro AS HUGEINT) * (CAST(n AS HUGEINT) * n * n - n)
      |      // (CAST(n AS HUGEINT) * n * n - n - tie) AS BIGINT)
      |    END AS h_corrected_micro,
      |  CASE WHEN CAST(n AS HUGEINT) * n * n - n - tie = 0 THEN NULL
      |    ELSE CAST(h_micro AS HUGEINT) * (CAST(n AS HUGEINT) * n * n - n)
      |      // (CAST(n AS HUGEINT) * n * n - n - tie) > 9487729
      |    END AS significant
      |FROM h""") { (s, d) =>
    def grp(p: String): Column =
      sum(when(col("o_orderpriority") === p, 1L).otherwise(0L))
    val c = Tables.orders(s, d)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100"
        + " AS BIGINT)").as("v"), col("o_orderpriority"))
      .groupBy(col("v"))
      .agg(grp("1-URGENT").as("c1"), grp("2-HIGH").as("c2"),
        grp("3-MEDIUM").as("c3"), grp("4-NOT SPECIFIED").as("c4"),
        grp("5-LOW").as("c5"), count(lit(1)).as("cnt"))
    val cum = DriftOps.exclusivePrefix(c, expr("v div 1000000"))
    def rsum(i: Int): Column =
      sum((col(s"c$i") * (lit(2L) * col("pre") + col("cnt") + lit(1L)))
        .cast(dec)).as(s"r$i")
    val r = cum.agg(rsum(1), rsum(2), rsum(3), rsum(4), rsum(5),
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(col("c3")).as("n3"), sum(col("c4")).as("n4"),
      sum(col("c5")).as("n5"), sum(col("cnt")).as("n"),
      sum((col("cnt").cast(dec) * col("cnt") * col("cnt") - col("cnt")))
        .as("tie"))
    val qterms = (1 to 5).map(i =>
      s"CASE WHEN n$i = 0 THEN 0 ELSE r$i * r$i div n$i END")
      .mkString(" + ")
    val h = r.select(col("n"), col("n1"), col("n2"), col("n3"), col("n4"),
      col("n5"), col("tie"),
      expr(s"CAST(CAST(3000000 AS DECIMAL(38,0)) * ($qterms)"
        + " div (n * (n + 1)) - 3000000 * (n + 1) AS BIGINT)")
        .as("h_micro"))
    h.select(col("n"), col("n1"), col("n2"), col("n3"), col("n4"),
        col("n5"), col("h_micro"), col("tie").cast(LongType).as("tie_mass"),
        when(expr("CAST(n AS DECIMAL(38,0)) * n * n - n - tie") === 0,
          lit(null).cast(LongType))
          .otherwise(expr("CAST(CAST(h_micro AS DECIMAL(38,0))"
            + " * (CAST(n AS DECIMAL(38,0)) * n * n - n)"
            + " div (CAST(n AS DECIMAL(38,0)) * n * n - n - tie)"
            + " AS BIGINT)")).as("h_corrected_micro"),
        when(expr("CAST(n AS DECIMAL(38,0)) * n * n - n - tie") === 0,
          lit(null).cast(BooleanType))
          .otherwise(expr("CAST(h_micro AS DECIMAL(38,0))"
            + " * (CAST(n AS DECIMAL(38,0)) * n * n - n)"
            + " div (CAST(n AS DECIMAL(38,0)) * n * n - n - tie)"
            + " > 9487729")).as("significant"))
  }

  /** Two-sided 10% trimmed mean (r18b) — the robust-location
    * companion to `agg_winsorized_mean` (winsorize CLAMPS the
    * tails; trimming DROPS them): per return flag, drop the k =
    * ⌊n/10⌋ cheapest and k dearest line items by extended price and
    * average the middle. Spelled at histogram granularity so no
    * whole-group sort ever runs: per-(flag, cents) counts, a
    * BUCKETED prefix pass (window partitioned by (flag, v div 10⁶)
    * plus a broadcast bucket-offset self-join — the
    * `exclusivePrefix` discipline with a compound key), then each
    * histogram row contributes |[pre+1, pre+cnt] ∩ [k+1, n−k]|
    * copies of its value — exact BIGINT overlap algebra, identical
    * in both engines. At 100 TB the shuffles carry distinct cents
    * values only. */
  val aggTrimmedMean: QDef = q(
    "agg_trimmed_mean",
    """WITH c AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (
      |  SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n,
      |    CAST(SUM(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS sall
      |  FROM c GROUP BY flag),
      |cum AS (
      |  SELECT flag, v, cnt,
      |    CAST(COALESCE(SUM(cnt) OVER (PARTITION BY flag ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS pre
      |  FROM c),
      |k AS (SELECT flag, n, sall, n // 10 AS kk FROM t),
      |kept AS (
      |  SELECT cum.flag,
      |    CAST(SUM(GREATEST(0, LEAST(cum.pre + cum.cnt, k.n - k.kk)
      |      - GREATEST(cum.pre, k.kk)) * CAST(cum.v AS HUGEINT)) AS HUGEINT)
      |      AS skept
      |  FROM cum JOIN k ON k.flag = cum.flag GROUP BY cum.flag)
      |SELECT k.flag AS l_returnflag, k.n, k.kk AS n_trimmed_each,
      |  CAST(k.sall // k.n AS BIGINT) AS mean_cents,
      |  CAST(kept.skept // (k.n - 2 * k.kk) AS BIGINT)
      |    AS trimmed_mean_cents
      |FROM k JOIN kept ON kept.flag = k.flag ORDER BY 1""") { (s, d) =>
    val c = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100"
          + " AS BIGINT)").as("v"))
      .groupBy(col("flag"), col("v")).agg(count(lit(1)).as("cnt"))
    val t = c.groupBy(col("flag"))
      .agg(sum(col("cnt")).as("n"),
        sum(col("v").cast(dec) * col("cnt")).as("sall"))
    // bucketed exclusive prefix within flag (the exclusivePrefix
    // discipline, compound (flag, bkt) key): the window partition is
    // one value-bucket of one flag, never a whole group
    val cb = c.withColumn("bkt", expr("v div 1000000"))
    val w = Window.partitionBy(col("flag"), col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = cb.withColumn("run", sum(col("cnt")).over(w))
    val btot = cb.groupBy(col("flag"), col("bkt"))
      .agg(sum(col("cnt")).as("bt"))
    val bpre = btot.as("x")
      .join(broadcast(btot.select(col("flag").as("yflag"),
          col("bkt").as("ybkt"), col("bt").as("ybt"))),
        col("yflag") === col("x.flag") && col("ybkt") < col("x.bkt"),
        "left")
      .groupBy(col("x.flag").as("flag"), col("x.bkt").as("bkt"))
      .agg(coalesce(sum(col("ybt")), lit(0L)).as("off"))
    val cum = within.join(broadcast(bpre), Seq("flag", "bkt"))
      .withColumn("pre", col("run") - col("cnt") + col("off"))
    val k = t.select(col("flag").as("kflag"), col("n"), col("sall"),
      expr("n div 10").as("kk"))
    val kept = cum.join(broadcast(k), col("kflag") === col("flag"))
      .select(col("flag"),
        (greatest(lit(0L), least(col("pre") + col("cnt"),
          col("n") - col("kk")) - greatest(col("pre"), col("kk")))
          * col("v").cast(dec)).as("contrib"))
      .groupBy(col("flag")).agg(sum(col("contrib")).as("skept"))
    kept.join(broadcast(k), col("kflag") === col("flag"))
      .select(col("flag").as("l_returnflag"), col("n"),
        col("kk").as("n_trimmed_each"),
        expr("CAST(sall div n AS BIGINT)").as("mean_cents"),
        expr("CAST(skept div (n - 2 * kk) AS BIGINT)")
          .as("trimmed_mean_cents"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[QDef] = Seq(
    textGopherRules, packPaddingWasteSweep, statsJarqueBera,
    statsKruskalWallis, aggTrimmedMean)
}
