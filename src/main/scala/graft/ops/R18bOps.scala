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
    * DECIMAL(38) partials), the n-scaled numerators
    * n·Σx²−(Σx)², n²Σx³−3nΣxΣx²+2(Σx)³,
    * n³Σx⁴−4n²ΣxΣx³+6n(Σx)²Σx²−3(Σx)⁴ are exact integer algebra,
    * and the central moments m_k = numerator div n^k are FLOORED
    * exact integers (quantization, not float drift — and the floor
    * keeps every DOUBLE operand below 2⁵³, the DecimalCastBounds
    * rule; S² = m3²/m2³, K = m4/m2²). ONLY the final ratios go
    * through one identical float tree (floor micro). m2 = 0
    * (constant column) guards to NULL. One grouped agg + row-local
    * algebra — two exchanges, constant output. χ²₂ 5%-critical
    * 5.991465 pins `significant`. */
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
      |    CAST((n * s2 - s1 * s1) // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |      AS m2,
      |    CAST((n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1)
      |      // (CAST(n AS HUGEINT) * n * n) AS BIGINT) AS m3,
      |    CAST((n * n * n * s4 - 4 * n * n * s1 * s3
      |        + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1)
      |      // (CAST(n AS HUGEINT) * n * n * n) AS BIGINT) AS m4
      |  FROM m)
      |SELECT event_type, n,
      |  CASE WHEN m2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)
      |      / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))
      |      * 1000000) AS BIGINT) END AS skew_sq_micro,
      |  CASE WHEN m2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(m4 AS DOUBLE)
      |      / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) * 1000000)
      |      AS BIGINT) END AS kurt_micro,
      |  CASE WHEN m2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(n AS DOUBLE)
      |      * (CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)
      |          / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE))
      |        + (CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE)) - 3)
      |          * (CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE)) - 3) / 4) / 6 * 1000000)
      |      AS BIGINT) END AS jb_micro,
      |  CASE WHEN m2 = 0 THEN NULL ELSE
      |    CAST(FLOOR(CAST(n AS DOUBLE)
      |      * (CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)
      |          / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE))
      |        + (CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE)) - 3)
      |          * (CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE)
      |            * CAST(m2 AS DOUBLE)) - 3) / 4) / 6 * 1000000)
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
      expr("CAST((CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1)"
        + " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)").as("m2"),
      expr("CAST((CAST(n AS DECIMAL(38,0)) * n * s3"
        + " - 3 * CAST(n AS DECIMAL(38,0)) * s1 * s2"
        + " + 2 * s1 * s1 * s1)"
        + " div (CAST(n AS DECIMAL(38,0)) * n * n) AS BIGINT)").as("m3"),
      expr("CAST((CAST(n AS DECIMAL(38,0)) * n * n * s4"
        + " - 4 * CAST(n AS DECIMAL(38,0)) * n * s1 * s3"
        + " + 6 * CAST(n AS DECIMAL(38,0)) * s1 * s1 * s2"
        + " - 3 * s1 * s1 * s1 * s1)"
        + " div (CAST(n AS DECIMAL(38,0)) * n * n * n) AS BIGINT)")
        .as("m4"))
    // the ONE float tree, spelled identically to the oracle
    val jbTree = "CAST(n AS DOUBLE)" +
      " * (CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)" +
      " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))" +
      " + (CAST(m4 AS DOUBLE) / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE))" +
      " - 3) * (CAST(m4 AS DOUBLE)" +
      " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) - 3) / 4) / 6" +
      " * 1000000"
    a.select(col("event_type"), col("n"),
        when(col("m2") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(FLOOR(CAST(m3 AS DOUBLE) * CAST(m3 AS DOUBLE)"
            + " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)"
            + " * CAST(m2 AS DOUBLE)) * 1000000) AS BIGINT)"))
          .as("skew_sq_micro"),
        when(col("m2") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(FLOOR(CAST(m4 AS DOUBLE)"
            + " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)) * 1000000)"
            + " AS BIGINT)")).as("kurt_micro"),
        when(col("m2") === 0, lit(null).cast(LongType))
          .otherwise(expr(s"CAST(FLOOR($jbTree) AS BIGINT)")).as("jb_micro"),
        when(col("m2") === 0, lit(null).cast(BooleanType))
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
      .persist()
    // bucketed exclusive prefix within flag (the exclusivePrefix
    // discipline, compound (flag, bkt) key): the window partition is
    // one value-bucket of one flag, never a whole group
    val cb = c.withColumn("bkt", expr("v div 1000000"))
    val w = Window.partitionBy(col("flag"), col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = cb.withColumn("run", sum(col("cnt")).over(w))
    val btot = cb.groupBy(col("flag"), col("bkt"))
      .agg(sum(col("cnt")).as("bt"),
        sum(col("v").cast(dec) * col("cnt")).as("bv"))
    // flag totals fold over the tiny bucket-total frame — the
    // histogram is scanned once, never re-aggregated per consumer
    val t = btot.groupBy(col("flag"))
      .agg(sum(col("bt")).as("n"), sum(col("bv")).as("sall"))
    val bpre = btot.select(col("flag"), col("bkt"), col("bt")).as("x")
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

  /** Consistent-hash ring rebalance audit (r18b) — the shard-plan
    * question behind every growing 100 TB store: adding one node to
    * an 8-node × 16-vnode md5 ring should move ≈ 1/9 of the keys
    * and NOTHING else. Both rings are deterministic md5 constants
    * (vnode hash = first 8 hex of md5('node<n>:<rep>'), key hash
    * likewise over 'key:<doc_id>'); assignment is the classic
    * successor rule (min vnode hash ≥ key hash, wrapping to the
    * global min). Graded per node: key counts before/after, keys
    * arriving, plus the overall moved count and floor-ppm — the
    * whole point of consistent hashing made measurable. Plan: the
    * ring is ONE broadcast ≤144-row side and BOTH rings' successors
    * come out of a single conditional-min agg keyed by doc (ring8 is
    * the node<8 restriction inside the same fold); vh→node ties
    * resolve ring-side so the doc-keyed shuffle happens exactly
    * once. At scale the successor scan becomes a range-bucketed
    * lookup; the broadcast-join spelling here has identical
    * semantics. */
  val shardConsistentHashMoves: QDef = q(
    "shard_consistent_hash_moves",
    """WITH nodes9 AS (SELECT CAST(unnest(range(0, 9)) AS BIGINT) AS node),
      |reps AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS rep),
      |ring9 AS (
      |  SELECT node, rep,
      |    ('0x' || substr(md5('node' || CAST(node AS VARCHAR) || ':'
      |      || CAST(rep AS VARCHAR)), 1, 8))::BIGINT AS vh
      |  FROM nodes9 CROSS JOIN reps),
      |ring8 AS (SELECT * FROM ring9 WHERE node < 8),
      |k AS (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('key:' || CAST(doc_id AS VARCHAR)), 1, 8))
      |      ::BIGINT AS kh
      |  FROM documents),
      |w8 AS (SELECT MIN(vh) AS wvh FROM ring8),
      |w9 AS (SELECT MIN(vh) AS wvh FROM ring9),
      |a8 AS (
      |  SELECT k.doc_id,
      |    COALESCE(MIN(CASE WHEN r.vh >= k.kh THEN r.vh END),
      |      (SELECT wvh FROM w8)) AS avh
      |  FROM k CROSS JOIN ring8 r GROUP BY k.doc_id, k.kh),
      |a9 AS (
      |  SELECT k.doc_id,
      |    COALESCE(MIN(CASE WHEN r.vh >= k.kh THEN r.vh END),
      |      (SELECT wvh FROM w9)) AS avh
      |  FROM k CROSS JOIN ring9 r GROUP BY k.doc_id, k.kh),
      |n8 AS (
      |  SELECT a8.doc_id, MIN(r.node) AS node
      |  FROM a8 JOIN ring8 r ON r.vh = a8.avh GROUP BY a8.doc_id),
      |n9 AS (
      |  SELECT a9.doc_id, MIN(r.node) AS node
      |  FROM a9 JOIN ring9 r ON r.vh = a9.avh GROUP BY a9.doc_id),
      |mv AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |    CAST(SUM(CASE WHEN n8.node <> n9.node THEN 1 ELSE 0 END)
      |      AS BIGINT) AS moved
      |  FROM n8 JOIN n9 ON n9.doc_id = n8.doc_id),
      |cb AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM n8 GROUP BY node),
      |ca AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM n9 GROUP BY node),
      |ar AS (
      |  SELECT n9.node, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM n9 JOIN n8 ON n8.doc_id = n9.doc_id
      |  WHERE n8.node <> n9.node GROUP BY n9.node)
      |SELECT nodes9.node,
      |  CAST(COALESCE(cb.c, 0) AS BIGINT) AS keys_before,
      |  CAST(COALESCE(ca.c, 0) AS BIGINT) AS keys_after,
      |  CAST(COALESCE(ar.c, 0) AS BIGINT) AS keys_arrived,
      |  mv.moved AS moved_total,
      |  CAST(mv.moved * 1000000 // mv.n_keys AS BIGINT) AS moved_ppm
      |FROM nodes9
      |LEFT JOIN cb ON cb.node = nodes9.node
      |LEFT JOIN ca ON ca.node = nodes9.node
      |LEFT JOIN ar ON ar.node = nodes9.node
      |CROSS JOIN mv
      |ORDER BY nodes9.node""") { (s, d) =>
    val ring9 = s.range(0, 9).select(col("id").as("node"))
      .crossJoin(s.range(0, 16).select(col("id").as("rep")))
      .select(col("node"), col("rep"),
        conv(substring(md5(concat(lit("node"),
          col("node").cast(StringType), lit(":"),
          col("rep").cast(StringType))), 1, 8), 16, 10)
          .cast(LongType).as("vh"))
    val k = Tables.documents(s, d).select(col("doc_id"),
      conv(substring(md5(concat(lit("key:"),
        col("doc_id").cast(StringType))), 1, 8), 16, 10)
        .cast(LongType).as("kh"))
    // Row-local successor search (r19-opt, guide §2.3/§4 — the MMR
    // pattern): the r18b spelling exploded every doc against the
    // 144-row broadcast ring (|docs|×144 rows through a doc-keyed
    // conditional-min agg — the plan's only fact-sized exchange).
    // Both rings collapse ring-side into ONE sorted array of
    // combined keys c = vh*256 + node: vh is 32 bits and node < 9,
    // so min(c | c ≥ kh*256) orders by vh first, then node —
    // EXACTLY the old (min vh ≥ kh, then min node at that vh)
    // successor-with-tie rule, and element 0 of the sorted array is
    // the wrap target (min vh, min node at it). Each doc then
    // resolves both assignments in one row-local array probe
    // (filter + element_at over ≤144 elements, never under a
    // Generate) and the doc-keyed exchange disappears from the plan.
    val rings = ring9.agg(
      sort_array(collect_list(when(col("node") < 8,
        col("vh") * 256 + col("node")))).as("arr8"),
      sort_array(collect_list(col("vh") * 256 + col("node"))).as("arr9"))
    // get() not element_at(): the filtered array is EMPTY for keys
    // hashing past the last vnode (the wrap case) and ANSI
    // element_at throws on the invalid index where get returns null
    def succNode(arr: Column, kh: Column): Column =
      coalesce(get(filter(arr, x => x >= kh * 256), lit(0)),
        get(arr, lit(0))) % 256
    val both = k.crossJoin(broadcast(rings))
      .select(col("doc_id"),
        succNode(col("arr8"), col("kh")).as("node_b"),
        succNode(col("arr9"), col("kh")).as("node_a"))
      .persist()
    val mv = both.agg(count(lit(1)).as("n_keys"),
      sum(when(col("node_b") =!= col("node_a"), 1L).otherwise(0L))
        .as("moved"))
    val cb = both.groupBy(col("node_b").as("cb_node"))
      .agg(count(lit(1)).as("cb_c"))
    val ca = both.groupBy(col("node_a").as("ca_node"))
      .agg(count(lit(1)).as("ca_c"))
    val ar = both.filter(col("node_b") =!= col("node_a"))
      .groupBy(col("node_a").as("ar_node"))
      .agg(count(lit(1)).as("ar_c"))
    val out = s.range(0, 9).select(col("id").as("node"))
      .join(broadcast(cb), col("cb_node") === col("node"), "left")
      .join(broadcast(ca), col("ca_node") === col("node"), "left")
      .join(broadcast(ar), col("ar_node") === col("node"), "left")
      .crossJoin(broadcast(mv))
      .select(col("node"),
        coalesce(col("cb_c"), lit(0L)).as("keys_before"),
        coalesce(col("ca_c"), lit(0L)).as("keys_after"),
        coalesce(col("ar_c"), lit(0L)).as("keys_arrived"),
        col("moved").as("moved_total"),
        expr("moved * 1000000 div n_keys").as("moved_ppm"))
      .orderBy(col("node"))
    out
  }

  /** Two-stage cluster sampling with Horvitz–Thompson estimation
    * (r18b) — the survey design a 100 TB corpus audit actually runs:
    * stage 1 samples whole SOURCES (md5 Bernoulli, π₁ = 2/5), stage
    * 2 samples docs WITHIN selected sources (md5 Bernoulli,
    * π₂ = 1/4); the HT estimator weights every sampled token count
    * by 1/(π₁π₂) = 10. Graded per source (selection flag, doc and
    * token counts, sampled counts) with the corpus-level estimate,
    * truth, and signed error ppm as broadcast fold columns — the
    * end-to-end check that the design's unbiasedness algebra
    * survives distribution. Both draws are independent md5 channels
    * ('s1:'source vs 's2:'doc_id). Entirely agg-shaped: one source
    * fold + two 1-row broadcasts. */
  val sampleClusterTwostage: QDef = q(
    "sample_cluster_twostage",
    """WITH s AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CASE WHEN ('0x' || substr(md5('s1:' || source), 1, 4))::BIGINT
      |      % 5 < 2 THEN 1 ELSE 0 END AS sel1,
      |    CASE WHEN ('0x' || substr(md5('s2:' || CAST(doc_id AS VARCHAR)),
      |      1, 4))::BIGINT % 4 = 0 THEN 1 ELSE 0 END AS sel2
      |  FROM documents),
      |bysrc AS (
      |  SELECT source, MAX(sel1) AS sampled_cluster,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(ntok) AS BIGINT) AS true_tokens,
      |    CAST(SUM(sel1 * sel2) AS BIGINT) AS n_sampled,
      |    CAST(SUM(sel1 * sel2 * ntok) AS BIGINT) AS sampled_tokens
      |  FROM s GROUP BY source),
      |tot AS (
      |  SELECT CAST(SUM(true_tokens) AS BIGINT) AS true_total,
      |    CAST(SUM(sampled_tokens) * 10 AS BIGINT) AS est_total
      |  FROM bysrc)
      |SELECT bysrc.source, bysrc.sampled_cluster = 1 AS sampled_cluster,
      |  bysrc.n_docs, bysrc.true_tokens, bysrc.n_sampled,
      |  bysrc.sampled_tokens, tot.true_total, tot.est_total,
      |  CAST((tot.est_total - tot.true_total) * 1000000 // tot.true_total
      |    AS BIGINT) AS err_ppm
      |FROM bysrc CROSS JOIN tot ORDER BY bysrc.source""") { (s, d) =>
    val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("ntok"),
      when(conv(substring(md5(concat(lit("s1:"), col("source"))), 1, 4),
        16, 10).cast(LongType) % 5 < 2, 1L).otherwise(0L).as("sel1"),
      when(conv(substring(md5(concat(lit("s2:"),
        col("doc_id").cast(StringType))), 1, 4), 16, 10)
        .cast(LongType) % 4 === 0, 1L).otherwise(0L).as("sel2"))
    val bysrc = base.groupBy(col("source"))
      .agg(max(col("sel1")).as("sc"), count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("true_tokens"),
        sum(col("sel1") * col("sel2")).as("n_sampled"),
        sum(col("sel1") * col("sel2") * col("ntok")).as("sampled_tokens"))
    val tot = bysrc.agg(sum(col("true_tokens")).as("true_total"),
      (sum(col("sampled_tokens")) * 10).as("est_total"))
    bysrc.crossJoin(broadcast(tot))
      .select(col("source"), (col("sc") === 1L).as("sampled_cluster"),
        col("n_docs"), col("true_tokens"), col("n_sampled"),
        col("sampled_tokens"), col("true_total"), col("est_total"),
        expr("(est_total - true_total) * 1000000 div true_total")
          .as("err_ppm"))
      .orderBy(col("source"))
  }

  /** 14-day RSI, SMA variant (r18b) — Wilder's relative strength
    * over daily revenue per event type, in the simple-moving-average
    * form whose windowed sums stay EXACT integers (the classic
    * recursive EMA form is not distributable without a float
    * recursion): daily delta vs the prior day (type-partitioned lag),
    * gains/losses split, 14-day ROWS sums, and
    * RSI·ppm = 10⁶·Σgain div (Σgain + Σloss) — the averaging
    * denominators cancel, so the whole indicator is one exact
    * rational. Rows emitted once 14 full deltas exist (row 15
    * onward). Flat-fortnight (both sums zero) guards to NULL. All
    * windows partitioned by type over day totals — day-count-sized
    * frames. */
  val winRsiSma: QDef = q(
    "win_rsi_sma",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |dl AS (
      |  SELECT event_type, day, cents,
      |    cents - lag(cents) OVER (PARTITION BY event_type ORDER BY day)
      |      AS delta,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM dtot),
      |gl AS (
      |  SELECT event_type, day, rn,
      |    GREATEST(delta, 0) AS gain, GREATEST(-delta, 0) AS loss
      |  FROM dl),
      |w AS (
      |  SELECT event_type, day, rn,
      |    CAST(SUM(gain) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS gs,
      |    CAST(SUM(loss) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS ls
      |  FROM gl)
      |SELECT event_type, day, gs AS gain_sum, ls AS loss_sum,
      |  CASE WHEN gs + ls = 0 THEN NULL
      |    ELSE CAST(gs * 1000000 // (gs + ls) AS BIGINT) END AS rsi_ppm
      |FROM w WHERE rn >= 15
      |ORDER BY event_type, day""") { (s, d) =>
    val dtot = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)"))
        .cast(LongType).as("cents"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, Window.currentRow)
    val dl = dtot
      .withColumn("delta", col("cents") - lag(col("cents"), 1).over(wOrd))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("gain", greatest(col("delta"), lit(0L)))
      .withColumn("loss", greatest(-col("delta"), lit(0L)))
      .withColumn("gs", sum(col("gain")).over(w14).cast(LongType))
      .withColumn("ls", sum(col("loss")).over(w14).cast(LongType))
    dl.filter(col("rn") >= 15)
      .select(col("event_type"), col("day"), col("gs").as("gain_sum"),
        col("ls").as("loss_sum"),
        when(col("gs") + col("ls") === 0, lit(null).cast(LongType))
          .otherwise(expr("gs * 1000000 div (gs + ls)")).as("rsi_ppm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Stochastic oscillator %K/%D (r18b) — where does today's revenue
    * sit inside the last fortnight's range? %K·ppm =
    * 10⁶·(close − low₁₄) div (high₁₄ − low₁₄) over type-partitioned
    * 14-row min/max windows, %D = the 3-day SMA of %K spelled as an
    * exact floor-mean of the three ppm values (lag pair + div 3 —
    * a windowed AVG would be a float). Emitted once both the full
    * fortnight and three %K values exist (row 16 onward);
    * flat-range days guard %K to NULL and any NULL in the %D
    * triple propagates. Same dtot base and window discipline as
    * the RSI twin. */
  val winStochasticOsc: QDef = q(
    "win_stochastic_osc",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY event_type, day),
      |w AS (
      |  SELECT event_type, day, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn,
      |    CAST(MIN(cents) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS lo,
      |    CAST(MAX(cents) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
      |  FROM dtot),
      |k AS (
      |  SELECT event_type, day, rn, lo, hi,
      |    CASE WHEN hi = lo THEN NULL
      |      ELSE CAST((cents - lo) * 1000000 // (hi - lo) AS BIGINT) END
      |      AS k_ppm
      |  FROM w),
      |kd AS (
      |  SELECT event_type, day, rn, k_ppm,
      |    lag(k_ppm, 1) OVER (PARTITION BY event_type ORDER BY day) AS k1,
      |    lag(k_ppm, 2) OVER (PARTITION BY event_type ORDER BY day) AS k2
      |  FROM k)
      |SELECT event_type, day, k_ppm,
      |  CAST((k_ppm + k1 + k2) // 3 AS BIGINT) AS d_ppm
      |FROM kd WHERE rn >= 16
      |ORDER BY event_type, day""") { (s, d) =>
    val dtot = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)"))
        .cast(LongType).as("cents"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val w14 = wOrd.rowsBetween(-13, Window.currentRow)
    val k = dtot
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("lo", min(col("cents")).over(w14).cast(LongType))
      .withColumn("hi", max(col("cents")).over(w14).cast(LongType))
      .withColumn("k_ppm", when(col("hi") === col("lo"),
          lit(null).cast(LongType))
        .otherwise(expr("(cents - lo) * 1000000 div (hi - lo)")))
    k.withColumn("k1", lag(col("k_ppm"), 1).over(wOrd))
      .withColumn("k2", lag(col("k_ppm"), 2).over(wOrd))
      .filter(col("rn") >= 16)
      .select(col("event_type"), col("day"), col("k_ppm"),
        expr("CAST((k_ppm + k1 + k2) div 3 AS BIGINT)").as("d_ppm"))
      .orderBy(col("event_type"), col("day"))
  }

  /** M/M/1 queueing audit (r18b) — the capacity-planning algebra an
    * event-ingest pipeline publishes per stream: arrivals n over the
    * observed span (exact µs epochs), deterministic synthetic
    * service time = value cents in ms, utilization
    * ρ·ppm = 10⁶·Σsvc div span_ms, queue length Lq = ρ²/(1−ρ) and
    * wait Wq = Lq/λ both as exact rationals on the ppm integers
    * (ρ ≥ 1 and zero-span guard to NULL). ONE grouped agg + row
    * algebra — the entire operator is a fold, constant output at
    * any scale. */
  val opsQueueingMm1: QDef = q(
    "ops_queueing_mm1",
    """WITH e AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS svc_ms
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST((MAX(us) - MIN(us)) // 1000 AS BIGINT) AS span_ms,
      |    CAST(SUM(svc_ms) AS BIGINT) AS svc_total_ms
      |  FROM e GROUP BY event_type),
      |r AS (
      |  SELECT event_type, n, span_ms, svc_total_ms,
      |    CAST(svc_total_ms * 1000 // n AS BIGINT) AS mean_svc_ms_milli,
      |    CASE WHEN span_ms = 0 THEN NULL
      |      ELSE CAST(svc_total_ms * 1000000 // span_ms AS BIGINT) END
      |      AS rho_ppm
      |  FROM m)
      |SELECT event_type, n, span_ms, mean_svc_ms_milli, rho_ppm,
      |  CASE WHEN rho_ppm IS NULL OR rho_ppm >= 1000000 THEN NULL
      |    ELSE CAST(rho_ppm * rho_ppm // (1000000 - rho_ppm) AS BIGINT)
      |    END AS lq_ppm,
      |  CASE WHEN rho_ppm IS NULL OR rho_ppm >= 1000000 THEN NULL
      |    ELSE CAST((rho_ppm * rho_ppm // (1000000 - rho_ppm)) * span_ms
      |      // (1000 * n) AS BIGINT) END AS wq_ms_milli
      |FROM r ORDER BY event_type""") { (s, d) =>
    val e = Tables.events(s, d).select(col("event_type"),
      unix_micros(col("ts")).as("us"),
      expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)")
        .as("svc_ms"))
    val m = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST((MAX(us) - MIN(us)) div 1000 AS BIGINT)").as("span_ms"),
        sum(col("svc_ms")).cast(LongType).as("svc_total_ms"))
    val r = m.select(col("event_type"), col("n"), col("span_ms"),
      col("svc_total_ms"),
      expr("CAST(svc_total_ms * 1000 div n AS BIGINT)")
        .as("mean_svc_ms_milli"),
      when(col("span_ms") === 0, lit(null).cast(LongType))
        .otherwise(expr("CAST(svc_total_ms * 1000000 div span_ms"
          + " AS BIGINT)")).as("rho_ppm"))
    r.select(col("event_type"), col("n"), col("span_ms"),
        col("mean_svc_ms_milli"), col("rho_ppm"),
        when(col("rho_ppm").isNull || col("rho_ppm") >= 1000000L,
          lit(null).cast(LongType))
          .otherwise(expr("CAST(rho_ppm * rho_ppm div (1000000 - rho_ppm)"
            + " AS BIGINT)")).as("lq_ppm"),
        when(col("rho_ppm").isNull || col("rho_ppm") >= 1000000L,
          lit(null).cast(LongType))
          .otherwise(expr("CAST((rho_ppm * rho_ppm div (1000000 - rho_ppm))"
            + " * span_ms div (1000 * n) AS BIGINT)")).as("wq_ms_milli"))
      .orderBy(col("event_type"))
  }

  /** Friedman rank test (r18b) — do the five event types keep the
    * same daily-volume ORDERING across the month, blocking on day?
    * The repeated-measures companion to `stats_kruskal_wallis`
    * (blocks kill the day-to-day level shifts KW would conflate).
    * Complete 30×5 matrix (absent cells are true zero counts),
    * EXACT doubled midranks within each day via the 5×5-per-day
    * pair self-join (2m = 2·#less + #equal + 1, #equal including
    * self), doubled rank sums, and
    * χ²F = 3·Σ(2R_j)² div (n·k·(k+1)) − 3·n·(k+1) in floor-micro —
    * the Σ(2R)² spelling absorbs the ΣR² = Σ(2R)²/4 factor into
    * 12/4 = 3, so NO floats anywhere. χ²₄ 5%-critical 9.487729.
    * All frames are day×type-sized. */
  val statsFriedmanTest: QDef = q(
    "stats_friedman_test",
    """WITH dt AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM dt),
      |types AS (SELECT DISTINCT event_type FROM dt),
      |cm AS (
      |  SELECT d.day, t.event_type, COALESCE(dt.cnt, 0) AS cnt
      |  FROM days d CROSS JOIN types t
      |  LEFT JOIN dt ON dt.day = d.day AND dt.event_type = t.event_type),
      |mid AS (
      |  SELECT a.day, a.event_type,
      |    CAST(2 * SUM(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END)
      |      + SUM(CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END) + 1 AS BIGINT)
      |      AS dm
      |  FROM cm a JOIN cm b ON b.day = a.day
      |  GROUP BY a.day, a.event_type, a.cnt),
      |rs AS (SELECT event_type, CAST(SUM(dm) AS BIGINT) AS r2sum
      |  FROM mid GROUP BY event_type),
      |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM days),
      |f AS (SELECT CAST(SUM(CAST(r2sum AS HUGEINT) * r2sum) AS HUGEINT)
      |    AS sr2, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM rs)
      |SELECT rs.event_type, rs.r2sum, nb.n AS n_days,
      |  CAST(3000000 * f.sr2 // (nb.n * f.k * (f.k + 1))
      |    - 3000000 * nb.n * (f.k + 1) AS BIGINT) AS chi2_micro,
      |  3000000 * f.sr2 // (nb.n * f.k * (f.k + 1))
      |    - 3000000 * nb.n * (f.k + 1) > 9487729 AS significant
      |FROM rs CROSS JOIN nb CROSS JOIN f
      |ORDER BY rs.event_type""") { (s, d) =>
    val dt = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val days = dt.select(col("day")).distinct()
    val types = dt.select(col("event_type")).distinct()
    val cm = days.crossJoin(broadcast(types))
      .join(dt.select(col("day").as("j_day"),
          col("event_type").as("j_type"), col("cnt")),
        col("j_day") === col("day") && col("j_type") === col("event_type"),
        "left")
      .select(col("day"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val mid = cm.as("a")
      .join(cm.select(col("day").as("b_day"), col("cnt").as("b_cnt")),
        col("b_day") === col("a.day"))
      .groupBy(col("a.day").as("day"), col("event_type"), col("a.cnt"))
      .agg((lit(2L) * count_if(col("b_cnt") < col("a.cnt"))
        + count_if(col("b_cnt") === col("a.cnt")) + lit(1L)).as("dm"))
    val rs = mid.groupBy(col("event_type")).agg(sum(col("dm")).as("r2sum"))
    val nb = days.agg(count(lit(1)).as("n"))
    val f = rs.agg(sum(col("r2sum").cast(dec) * col("r2sum")).as("sr2"),
      count(lit(1)).as("k"))
    rs.crossJoin(broadcast(nb)).crossJoin(broadcast(f))
      .select(col("event_type"), col("r2sum"), col("n").as("n_days"),
        expr("CAST(3000000 * sr2 div (n * k * (k + 1))"
          + " - 3000000 * n * (k + 1) AS BIGINT)").as("chi2_micro"))
      .withColumn("significant", col("chi2_micro") > 9487729L)
      .orderBy(col("event_type"))
  }

  /** Krippendorff's alpha, nominal (r18b) — the agreement
    * coefficient that HANDLES MISSING RATINGS, which Fleiss' kappa
    * (`stats_fleiss_kappa`) cannot: each of the three deterministic
    * rule-raters skips a document when its md5 presence draw fails
    * (p = 13/16), documents with fewer than two ratings drop, and
    * α = 1 − Do/De is ONE exact rational after clearing the
    * per-document (m_i − 1) ∈ {1, 2} denominators by doubling:
    * T = Σ_i 2·D_i/(m_i−1) is always an integer
    * (D_i = Σ_c n_ic(m_i − n_ic)), Do = T/(2n), De =
    * Σ_c n_c(n − n_c)/(n(n−1)), so α·ppm = 10⁶ −
    * T·(n−1)·10⁶ div (2·Σ_c n_c(n−n_c)). Category boundaries are
    * rater-specific token-count bands centered on the fixture's
    * 10–100 token range (40/70 ± rater offsets) so all three
    * categories are populated. Row-local per doc + ONE corpus fold. */
  val evalKrippendorffAlpha: QDef = q(
    "eval_krippendorff_alpha",
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |  FROM documents),
      |r AS (
      |  SELECT doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':kr0'), 1, 1)
      |      < 'd' THEN CASE WHEN ntok < 40 THEN 0 WHEN ntok < 70 THEN 1
      |        ELSE 2 END END AS r0,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':kr1'), 1, 1)
      |      < 'd' THEN CASE WHEN ntok < 45 THEN 0 WHEN ntok < 65 THEN 1
      |        ELSE 2 END END AS r1,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':kr2'), 1, 1)
      |      < 'd' THEN CASE WHEN ntok < 35 THEN 0 WHEN ntok < 75 THEN 1
      |        ELSE 2 END END AS r2
      |  FROM t),
      |n AS (
      |  SELECT
      |    (CASE WHEN r0 = 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 0 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    (CASE WHEN r0 = 1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    (CASE WHEN r0 = 2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r1 = 2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN r2 = 2 THEN 1 ELSE 0 END) AS n2
      |  FROM r),
      |inc AS (SELECT n0, n1, n2, n0 + n1 + n2 AS m FROM n
      |  WHERE n0 + n1 + n2 >= 2),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(m) AS BIGINT) AS ntot,
      |    CAST(SUM(n0) AS BIGINT) AS c0, CAST(SUM(n1) AS BIGINT) AS c1,
      |    CAST(SUM(n2) AS BIGINT) AS c2,
      |    CAST(SUM(CASE WHEN m = 3
      |      THEN n0 * (m - n0) + n1 * (m - n1) + n2 * (m - n2)
      |      ELSE 2 * (n0 * (m - n0) + n1 * (m - n1) + n2 * (m - n2))
      |      END) AS BIGINT) AS tt
      |  FROM inc)
      |SELECT nd AS n_docs, ntot AS n_ratings, c0, c1, c2,
      |  CAST(tt * 1000000 // (2 * ntot) AS BIGINT) AS do_ppm,
      |  CAST((c0 * (ntot - c0) + c1 * (ntot - c1) + c2 * (ntot - c2))
      |    * 1000000 // (ntot * (ntot - 1)) AS BIGINT) AS de_ppm,
      |  CASE WHEN c0 * (ntot - c0) + c1 * (ntot - c1) + c2 * (ntot - c2)
      |    = 0 THEN NULL
      |    ELSE CAST(1000000 - tt * (ntot - 1) * 1000000
      |      // (2 * (c0 * (ntot - c0) + c1 * (ntot - c1)
      |        + c2 * (ntot - c2))) AS BIGINT) END AS alpha_ppm
      |FROM f""") { (s, d) =>
    val t = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("ntok"))
    def rater(i: Int, lo: Long, hi: Long): Column =
      when(substring(md5(concat(col("doc_id").cast(StringType),
          lit(s":kr$i"))), 1, 1) < "d",
        when(col("ntok") < lo, 0L).when(col("ntok") < hi, 1L)
          .otherwise(2L))
    val r = t.select(rater(0, 40, 70).as("r0"), rater(1, 45, 65).as("r1"),
      rater(2, 35, 75).as("r2"))
    def nj(j: Long): Column =
      Seq("r0", "r1", "r2")
        .map(c => when(col(c) === j, 1L).otherwise(0L)).reduce(_ + _)
    val inc = r.select(nj(0).as("n0"), nj(1).as("n1"), nj(2).as("n2"))
      .withColumn("m", col("n0") + col("n1") + col("n2"))
      .filter(col("m") >= 2)
    val di = col("n0") * (col("m") - col("n0")) +
      col("n1") * (col("m") - col("n1")) +
      col("n2") * (col("m") - col("n2"))
    val f = inc.agg(count(lit(1)).as("nd"), sum(col("m")).as("ntot"),
      sum(col("n0")).as("c0"), sum(col("n1")).as("c1"),
      sum(col("n2")).as("c2"),
      sum(when(col("m") === 3, di).otherwise(lit(2L) * di)).as("tt"))
    f.select(col("nd").as("n_docs"), col("ntot").as("n_ratings"),
      col("c0"), col("c1"), col("c2"),
      expr("CAST(tt * 1000000 div (2 * ntot) AS BIGINT)").as("do_ppm"),
      expr("CAST((c0 * (ntot - c0) + c1 * (ntot - c1) + c2 * (ntot - c2))"
        + " * 1000000 div (ntot * (ntot - 1)) AS BIGINT)").as("de_ppm"),
      when(expr("c0 * (ntot - c0) + c1 * (ntot - c1) + c2 * (ntot - c2)")
          === 0L, lit(null).cast(LongType))
        .otherwise(expr("CAST(1000000 - tt * (ntot - 1) * 1000000"
          + " div (2 * (c0 * (ntot - c0) + c1 * (ntot - c1)"
          + " + c2 * (ntot - c2))) AS BIGINT)")).as("alpha_ppm"))
  }

  /** Aspect-ratio bucketing plan (r18b) — the image-training prep
    * step every multimodal loader runs (group images into a fixed
    * set of aspect buckets so batches share a shape): deterministic
    * md5-synthetic dimensions (w, h = 128·(1 + md5%12), the
    * pre-decode-metadata convention of the multimodal family), five
    * canonical buckets {1:1, 4:3, 3:4, 16:9, 9:16}, and EXACT
    * nearest-ratio assignment — |w/h − n/d| comparisons cleared of
    * BOTH denominators (h cancels across candidates; ×(144/d)
    * clears d), argmin by (score, idx) via a doc-partitioned 5-row
    * rank window. Graded per bucket: image count, pixel mass, and
    * mean residual aspect error in floor-micro. At 100 TB the
    * explode side is a broadcast 5-row table and the argmin is a
    * doc-keyed window over 5-row partitions. */
  val multimodalAspectBuckets: QDef = q(
    "multimodal_aspect_buckets",
    """WITH img AS (
      |  SELECT doc_id,
      |    128 * (1 + ('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)),
      |      1, 2))::BIGINT % 12) AS w,
      |    128 * (1 + ('0x' || substr(md5('h:' || CAST(doc_id AS VARCHAR)),
      |      1, 2))::BIGINT % 12) AS h
      |  FROM documents),
      |bk AS (SELECT * FROM (VALUES (0, '1:1', 1, 1), (1, '4:3', 4, 3),
      |  (2, '3:4', 3, 4), (3, '16:9', 16, 9), (4, '9:16', 9, 16))
      |  AS t(idx, nm, bn, bd)),
      |sc AS (
      |  SELECT img.doc_id, img.w, img.h, bk.idx, bk.nm,
      |    abs(img.w * bk.bd - img.h * bk.bn) * (144 // bk.bd) AS score,
      |    abs(img.w * bk.bd - img.h * bk.bn) * 1000000
      |      // (img.h * bk.bd) AS err_micro
      |  FROM img CROSS JOIN bk),
      |pick AS (
      |  SELECT doc_id, w, h, idx, nm, err_micro,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score, idx)
      |      AS rn
      |  FROM sc)
      |SELECT CAST(idx AS BIGINT) AS bucket_idx, nm AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_images,
      |  CAST(SUM(w * h) AS BIGINT) AS total_pixels,
      |  CAST(SUM(err_micro) // COUNT(*) AS BIGINT) AS mean_err_micro
      |FROM pick WHERE rn = 1 GROUP BY idx, nm
      |ORDER BY bucket_idx""") { (s, d) =>
    import s.implicits._
    val img = Tables.documents(s, d).select(col("doc_id"),
      (lit(128L) * (lit(1L) + conv(substring(md5(concat(lit("w:"),
        col("doc_id").cast(StringType))), 1, 2), 16, 10)
        .cast(LongType) % 12)).as("w"),
      (lit(128L) * (lit(1L) + conv(substring(md5(concat(lit("h:"),
        col("doc_id").cast(StringType))), 1, 2), 16, 10)
        .cast(LongType) % 12)).as("h"))
    val bk = Seq((0L, "1:1", 1L, 1L), (1L, "4:3", 4L, 3L),
      (2L, "3:4", 3L, 4L), (3L, "16:9", 16L, 9L), (4L, "9:16", 9L, 16L))
      .toDF("idx", "nm", "bn", "bd")
    val sc = img.crossJoin(broadcast(bk))
      .select(col("doc_id"), col("w"), col("h"), col("idx"), col("nm"),
        (abs(col("w") * col("bd") - col("h") * col("bn"))
          * expr("144 div bd")).as("score"),
        expr("abs(w * bd - h * bn) * 1000000 div (h * bd)")
          .as("err_micro"))
    val wPick = Window.partitionBy(col("doc_id"))
      .orderBy(col("score"), col("idx"))
    sc.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .groupBy(col("idx").as("bucket_idx"), col("nm").as("bucket"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("w") * col("h")).as("total_pixels"),
        expr("CAST(SUM(err_micro) div COUNT(*) AS BIGINT)")
          .as("mean_err_micro"))
      .orderBy(col("bucket_idx"))
  }

  /** Benjamini–Hochberg FDR with a PLANTED signal (r18b) — the
    * multiple-testing step-up every experimentation platform runs,
    * graded against known ground truth: md5-designated "polluted"
    * sources (md5('plant:'·source) % 5 = 0) get an elevated
    * deterministic flag rate (base 2/10 ∨ boost 5/10 ≈ 0.6 vs 0.2),
    * each source is tested against the rest with the exact-integer
    * pooled two-proportion z² (the `stats_prop_ztest` spelling),
    * p-values are the CHERNOFF BOUND p ≤ exp(−z²/2) — a valid
    * conservative bound needing no erf, ONE identical exp float
    * tree — and BH at q = 0.10 runs as: rank by (p, source) via a
    * broadcast m-row self-join (no unpartitioned window), k* =
    * max{rank : p·m ≤ rank·q}, reject rank ≤ k*. The spec pins that
    * rejections land only on planted sources. All frames are
    * source-count-sized after one fold. */
  val statsBhFdr: QDef = q(
    "stats_bh_fdr",
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CASE WHEN ('0x' || substr(md5('plant:' || source), 1, 4))
      |      ::BIGINT % 5 = 0 THEN 1 ELSE 0 END AS planted,
      |    CASE WHEN ('0x' || substr(md5('bh:' || CAST(doc_id AS VARCHAR)),
      |      1, 4))::BIGINT % 10 < 2 THEN 1 ELSE 0 END AS base,
      |    CASE WHEN ('0x' || substr(md5('bh2:' || CAST(doc_id AS VARCHAR)),
      |      1, 4))::BIGINT % 10 < 5 THEN 1 ELSE 0 END AS boost
      |  FROM documents),
      |f AS (
      |  SELECT source, MAX(planted) AS planted,
      |    CAST(COUNT(*) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN base = 1 OR (planted = 1 AND boost = 1)
      |      THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |  FROM d GROUP BY source),
      |g AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn,
      |  CAST(SUM(c1) AS BIGINT) AS cc, CAST(COUNT(*) AS BIGINT) AS m
      |  FROM f),
      |p AS (
      |  SELECT f.source, f.planted, f.n1, f.c1, g.m,
      |    CASE WHEN g.cc = 0 OR g.nn - g.cc = 0 OR g.nn = f.n1
      |      THEN 1000000
      |      ELSE CAST(FLOOR(exp(-CAST(
      |        CAST(f.c1 * (g.nn - f.n1) - (g.cc - f.c1) * f.n1 AS HUGEINT)
      |          * (f.c1 * (g.nn - f.n1) - (g.cc - f.c1) * f.n1) * g.nn
      |          * 1000000
      |        // (CAST(f.n1 AS HUGEINT) * (g.nn - f.n1) * g.cc
      |          * (g.nn - g.cc)) AS DOUBLE) / 2000000) * 1000000)
      |        AS BIGINT) END AS p_micro
      |  FROM f CROSS JOIN g),
      |rk AS (
      |  SELECT a.source, a.planted, a.n1, a.c1, a.m, a.p_micro,
      |    CAST(1 + COUNT(b.source) AS BIGINT) AS bh_rank
      |  FROM p a LEFT JOIN p b ON b.p_micro < a.p_micro
      |    OR (b.p_micro = a.p_micro AND b.source < a.source)
      |  GROUP BY a.source, a.planted, a.n1, a.c1, a.m, a.p_micro),
      |km AS (SELECT COALESCE(MAX(CASE WHEN p_micro * m <= bh_rank * 100000
      |  THEN bh_rank END), 0) AS kmax FROM rk)
      |SELECT rk.source, rk.planted = 1 AS planted, rk.n1 AS n_docs,
      |  rk.c1 AS n_flagged, rk.p_micro AS p_bound_micro, rk.bh_rank,
      |  rk.bh_rank <= km.kmax AS rejected
      |FROM rk CROSS JOIN km ORDER BY rk.source""") { (s, d) =>
    val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
      when(conv(substring(md5(concat(lit("plant:"), col("source"))),
        1, 4), 16, 10).cast(LongType) % 5 === 0, 1L).otherwise(0L)
        .as("planted"),
      when(conv(substring(md5(concat(lit("bh:"),
        col("doc_id").cast(StringType))), 1, 4), 16, 10)
        .cast(LongType) % 10 < 2, 1L).otherwise(0L).as("base"),
      when(conv(substring(md5(concat(lit("bh2:"),
        col("doc_id").cast(StringType))), 1, 4), 16, 10)
        .cast(LongType) % 10 < 5, 1L).otherwise(0L).as("boost"))
    val f = base.groupBy(col("source"))
      .agg(max(col("planted")).as("planted"), count(lit(1)).as("n1"),
        sum(when(col("base") === 1 ||
          (col("planted") === 1 && col("boost") === 1), 1L)
          .otherwise(0L)).as("c1"))
    val g = f.agg(sum(col("n1")).as("nn"), sum(col("c1")).as("cc"),
      count(lit(1)).as("m"))
    val p = f.crossJoin(broadcast(g))
      .select(col("source"), col("planted"), col("n1"), col("c1"),
        col("m"),
        when(col("cc") === 0 || col("nn") - col("cc") === 0 ||
            col("nn") === col("n1"), lit(1000000L))
          .otherwise(expr("CAST(FLOOR(exp(-CAST("
            + "CAST(c1 * (nn - n1) - (cc - c1) * n1 AS DECIMAL(38,0))"
            + " * (c1 * (nn - n1) - (cc - c1) * n1) * nn * 1000000"
            + " div (CAST(n1 AS DECIMAL(38,0)) * (nn - n1) * cc"
            + " * (nn - cc)) AS DOUBLE) / 2000000) * 1000000)"
            + " AS BIGINT)")).as("p_micro"))
      .persist()
    val rk = p.as("a")
      .join(broadcast(p.select(col("p_micro").as("b_p"),
          col("source").as("b_src"))),
        col("b_p") < col("a.p_micro") ||
          (col("b_p") === col("a.p_micro") &&
            col("b_src") < col("a.source")), "left")
      .groupBy(col("a.source").as("source"), col("a.planted").as("planted"),
        col("a.n1").as("n1"), col("a.c1").as("c1"), col("a.m").as("m"),
        col("a.p_micro").as("p_micro"))
      .agg((lit(1L) + count(col("b_src"))).as("bh_rank"))
    val km = rk.agg(coalesce(max(when(
      col("p_micro") * col("m") <= col("bh_rank") * 100000L,
      col("bh_rank"))), lit(0L)).as("kmax"))
    rk.crossJoin(broadcast(km))
      .select(col("source"), (col("planted") === 1L).as("planted"),
        col("n1").as("n_docs"), col("c1").as("n_flagged"),
        col("p_micro").as("p_bound_micro"), col("bh_rank"),
        (col("bh_rank") <= col("kmax")).as("rejected"))
      .orderBy(col("source"))
  }

  /** Dyadic EWMA crossover signals (r18b) — the fast/slow
    * moving-average crossing count over daily revenue per type, on
    * the SAME truncated dyadic-geometric EWMA convention as
    * `win_ewma_dyadic` (weights 2^k, denominators 15 and 255 — all
    * integer, no float recursion): fast = 4-term (half-life 1 day),
    * slow = 8-term; a golden/death cross is a strict sign flip of
    * (fast − slow) between consecutive evaluated days (zero-diff
    * days break streaks, documented). Graded per type: evaluated
    * days, up/down cross counts, first cross date. One day agg +
    * ONE type-partitioned ordering (lags + the derived-sign lag) +
    * one fold. */
  val tsEwmaCrossover: QDef = q(
    "ts_ewma_crossover",
    """WITH dtot AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, day, cents,
      |    lag(cents, 1) OVER w AS c1, lag(cents, 2) OVER w AS c2,
      |    lag(cents, 3) OVER w AS c3, lag(cents, 4) OVER w AS c4,
      |    lag(cents, 5) OVER w AS c5, lag(cents, 6) OVER w AS c6,
      |    lag(cents, 7) OVER w AS c7
      |  FROM dtot WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |e AS (
      |  SELECT event_type, day,
      |    (cents * 8 + c1 * 4 + c2 * 2 + c3) // 15 AS fast,
      |    (cents * 128 + c1 * 64 + c2 * 32 + c3 * 16 + c4 * 8 + c5 * 4
      |      + c6 * 2 + c7) // 255 AS slow
      |  FROM l WHERE c7 IS NOT NULL),
      |sg AS (
      |  SELECT event_type, day,
      |    CASE WHEN fast > slow THEN 1 WHEN fast < slow THEN -1 ELSE 0
      |      END AS s
      |  FROM e),
      |x AS (
      |  SELECT event_type, day, s,
      |    lag(s) OVER (PARTITION BY event_type ORDER BY day) AS ps
      |  FROM sg)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(CASE WHEN s = 1 AND ps = -1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_cross_up,
      |  CAST(SUM(CASE WHEN s = -1 AND ps = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_cross_down,
      |  MIN(CASE WHEN (s = 1 AND ps = -1) OR (s = -1 AND ps = 1)
      |    THEN day END) AS first_cross_day
      |FROM x GROUP BY event_type ORDER BY event_type""") { (s, d) =>
    val dtot = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)"))
        .cast(LongType).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val l = dtot.select(Seq(col("event_type"), col("day"), col("cents")) ++
      (1 to 7).map(k => lag(col("cents"), k).over(w).as(s"c$k")): _*)
    val e = l.filter(col("c7").isNotNull)
      .select(col("event_type"), col("day"),
        expr("(cents * 8 + c1 * 4 + c2 * 2 + c3) div 15").as("fast"),
        expr("(cents * 128 + c1 * 64 + c2 * 32 + c3 * 16 + c4 * 8"
          + " + c5 * 4 + c6 * 2 + c7) div 255").as("slow"))
    val sg = e.select(col("event_type"), col("day"),
      when(col("fast") > col("slow"), 1L)
        .when(col("fast") < col("slow"), -1L).otherwise(0L).as("s"))
    val x = sg.withColumn("ps", lag(col("s"), 1).over(w))
    x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("s") === 1L && col("ps") === -1L, 1L).otherwise(0L))
          .as("n_cross_up"),
        sum(when(col("s") === -1L && col("ps") === 1L, 1L).otherwise(0L))
          .as("n_cross_down"),
        min(when((col("s") === 1L && col("ps") === -1L) ||
          (col("s") === -1L && col("ps") === 1L), col("day")))
          .as("first_cross_day"))
      .orderBy(col("event_type"))
  }

  /** PQ asymmetric-distance recall (r18b) — the search-quality
    * companion to `sim_pq_codes` (which grades the codebook
    * ASSIGNMENT; this grades what the compressed index actually
    * RETRIEVES): per panel probe, the ADC top-10 — distance =
    * Σ_subspace d2(q_sub, codebook[s, code_v]), computed entirely
    * from the (vec, subspace, code) assignment plus the 256-row
    * probe×code sub-distance table — against the exact milli-L2
    * top-10, as overlap and recall ppm. The SAME quantization, panel
    * (vec_id < 8 = the 8 codes), and (d2, id) tie order as the PQ
    * twin, so the two keys compose into one PQ story. Cost: the
    * code-assignment shuffle (vecs × 4 subspaces × 8 codes) + the
    * eval-tier brute-force leg bounded by the 8-probe panel — never
    * corpus². At scale ADC is the in-memory scan (4 bytes/vec);
    * the exact leg stays eval-tier. */
  val annPqAdcRecall: QDef = q(
    "ann_pq_adc_recall",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |qv AS (
      |  SELECT vec_id, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc,
      |    CAST((i - 1) // 16 AS INTEGER) AS s
      |  FROM embeddings CROSS JOIN dims),
      |cb AS (SELECT i, CAST(vec_id AS INTEGER) AS code, qc AS sc
      |  FROM qv WHERE vec_id < 8),
      |dist AS (
      |  SELECT q.vec_id, q.s, cb.code,
      |    CAST(SUM((q.qc - cb.sc) * (q.qc - cb.sc)) AS BIGINT) AS d2
      |  FROM qv q JOIN cb ON cb.i = q.i
      |  GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT vec_id, s, code FROM (
      |    SELECT vec_id, s, code,
      |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code)
      |        AS rn
      |    FROM dist) WHERE rn = 1),
      |qd AS (SELECT vec_id AS q_id, s, code, d2 FROM dist
      |  WHERE vec_id < 8),
      |adc AS (
      |  SELECT qd.q_id, c.vec_id, CAST(SUM(qd.d2) AS BIGINT) AS ad2
      |  FROM codes c JOIN qd ON qd.s = c.s AND qd.code = c.code
      |  WHERE c.vec_id <> qd.q_id GROUP BY 1, 2),
      |ext AS (
      |  SELECT a.vec_id AS q_id, b.vec_id,
      |    CAST(SUM((a.qc - b.qc) * (a.qc - b.qc)) AS BIGINT) AS d2
      |  FROM qv a JOIN qv b ON b.i = a.i AND b.vec_id <> a.vec_id
      |  WHERE a.vec_id < 8 GROUP BY 1, 2),
      |topex AS (SELECT q_id, vec_id FROM (
      |  SELECT q_id, vec_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS rn
      |  FROM ext) WHERE rn <= 10),
      |topadc AS (SELECT q_id, vec_id FROM (
      |  SELECT q_id, vec_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY ad2, vec_id) AS rn
      |  FROM adc) WHERE rn <= 10)
      |SELECT topex.q_id, CAST(COUNT(topadc.vec_id) AS BIGINT) AS n_overlap,
      |  CAST(COUNT(topadc.vec_id) * 1000000 // 10 AS BIGINT) AS recall_ppm
      |FROM topex LEFT JOIN topadc ON topadc.q_id = topex.q_id
      |  AND topadc.vec_id = topex.vec_id
      |GROUP BY topex.q_id ORDER BY topex.q_id""") { (s, d) =>
    val ex0 = LlmExtras.kmeansEx(s, d)
      .withColumn("s", expr("CAST(i div 16 AS INT)"))
    val cb = ex0.filter(col("vec_id") < 8)
      .select(col("i").as("ci"), col("vec_id").cast(IntegerType).as("code"),
        col("qc").as("sc"))
    val dist = ex0.join(broadcast(cb), col("ci") === col("i"))
      .groupBy(col("vec_id"), col("s"), col("code"))
      .agg(sum((col("qc") - col("sc")) * (col("qc") - col("sc"))).as("d2"))
      .persist()
    val codes = dist.groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("code"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.code").as("code"))
    val qd = dist.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("s").as("qs"),
        col("code").as("qcode"), col("d2"))
    val adc = codes.join(broadcast(qd),
        col("qs") === col("s") && col("qcode") === col("code") &&
          col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id")).agg(sum(col("d2")).as("ad2"))
    val qp = ex0.filter(col("vec_id") < 8)
      .select(col("vec_id").as("e_q"), col("i").as("qi"),
        col("qc").as("qqc"))
    val ext = ex0.join(broadcast(qp),
        col("qi") === col("i") && col("e_q") =!= col("vec_id"))
      .groupBy(col("e_q").as("q_id"), col("vec_id"))
      .agg(sum((col("qc") - col("qqc")) * (col("qc") - col("qqc")))
        .as("d2"))
    val wEx = Window.partitionBy(col("q_id")).orderBy(col("d2"),
      col("vec_id"))
    val topex = ext.withColumn("rn", row_number().over(wEx))
      .filter(col("rn") <= 10).select(col("q_id"), col("vec_id"))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("ad2"),
      col("vec_id"))
    val topadc = adc.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= 10)
      .select(col("q_id").as("a_q"), col("vec_id").as("a_v"))
    topex.join(topadc, col("a_q") === col("q_id") &&
        col("a_v") === col("vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(col("a_v")).as("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        expr("n_overlap * 1000000 div 10").as("recall_ppm"))
      .orderBy(col("q_id"))
  }

  /** AMS F₂ sketch audit (r18b) — the Alon–Matias–Szegedy second
    * moment (= self-join size on l_partkey) estimated with 16
    * deterministic md5 ±1 hash functions next to the exact
    * Σ freq²: Z_j = Σ_v s_j(v)·freq_v folds in ONE pass (16× via a
    * broadcast j cross join), estimates are Z_j², and the graded
    * summary is the textbook median-of-means (4 groups of 4, the
    * 4-row median via a broadcast rank self-join — no unpartitioned
    * window) with its signed error vs truth. EVERYTHING integer:
    * signs from one md5 hex parity, Z bounded by row count. The
    * sketch a join-size planner merges across shards at 100 TB —
    * constant state per hash function. */
  val sketchAmsF2: QDef = q(
    "sketch_ams_f2",
    """WITH f AS (
      |  SELECT l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1),
      |ex AS (SELECT CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2
      |  FROM f),
      |js AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j),
      |z AS (
      |  SELECT js.j,
      |    CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(js.j AS VARCHAR)
      |      || ':' || CAST(f.v AS VARCHAR)), 1, 1))::INT % 2 = 0
      |      THEN f.c ELSE -f.c END) AS BIGINT) AS zj
      |  FROM f CROSS JOIN js GROUP BY 1),
      |e AS (SELECT j, CAST(zj AS HUGEINT) * zj AS est, j // 4 AS grp
      |  FROM z),
      |gm AS (SELECT grp, CAST(SUM(est) // 4 AS BIGINT) AS mean_est
      |  FROM e GROUP BY grp),
      |rk AS (
      |  SELECT a.grp, a.mean_est,
      |    CAST(1 + COUNT(b.grp) AS BIGINT) AS rn
      |  FROM gm a LEFT JOIN gm b ON b.mean_est < a.mean_est
      |    OR (b.mean_est = a.mean_est AND b.grp < a.grp)
      |  GROUP BY a.grp, a.mean_est),
      |med AS (SELECT CAST(SUM(CASE WHEN rn IN (2, 3) THEN mean_est
      |  ELSE 0 END) // 2 AS BIGINT) AS mom FROM rk),
      |mn AS (SELECT CAST(SUM(est) // 16 AS BIGINT) AS mean16 FROM e)
      |SELECT ex.f2 AS exact_f2, mn.mean16 AS mean_est,
      |  med.mom AS median_of_means,
      |  CAST((med.mom - ex.f2) * 1000000 // ex.f2 AS BIGINT) AS err_ppm
      |FROM ex CROSS JOIN med CROSS JOIN mn""") { (s, d) =>
    import s.implicits._
    val f = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("v")).agg(count(lit(1)).as("c"))
    val ex = f.agg(sum(col("c").cast(dec) * col("c")).cast(LongType)
      .as("f2"))
    val js = (0L until 16L).toDF("j")
    val z = f.crossJoin(broadcast(js))
      .groupBy(col("j"))
      .agg(sum(when(conv(substring(md5(concat(col("j").cast(StringType),
          lit(":"), col("v").cast(StringType))), 1, 1), 16, 10)
          .cast(IntegerType) % 2 === 0, col("c"))
        .otherwise(-col("c"))).as("zj"))
    val e = z.select(col("j"), (col("zj").cast(dec) * col("zj")).as("est"),
      expr("j div 4").as("grp")).persist()
    val gm = e.groupBy(col("grp"))
      .agg(expr("CAST(SUM(est) div 4 AS BIGINT)").as("mean_est"))
    val rk = gm.as("a")
      .join(broadcast(gm.select(col("grp").as("b_grp"),
          col("mean_est").as("b_me"))),
        col("b_me") < col("a.mean_est") ||
          (col("b_me") === col("a.mean_est") &&
            col("b_grp") < col("a.grp")), "left")
      .groupBy(col("a.grp").as("grp"), col("a.mean_est").as("mean_est"))
      .agg((lit(1L) + count(col("b_grp"))).as("rn"))
    val med = rk.agg(expr("CAST(SUM(CASE WHEN rn IN (2, 3) THEN mean_est"
      + " ELSE 0 END) div 2 AS BIGINT)").as("mom"))
    val mn = e.agg(expr("CAST(SUM(est) div 16 AS BIGINT)").as("mean16"))
    ex.crossJoin(broadcast(med)).crossJoin(broadcast(mn))
      .select(col("f2").as("exact_f2"), col("mean16").as("mean_est"),
        col("mom").as("median_of_means"),
        expr("(mom - f2) * 1000000 div f2").as("err_ppm"))
  }

  /** Geometric + harmonic means (r18b) — the AM ≥ GM ≥ HM triple
    * per return flag over milli-quantized quantities: GM through the
    * house quantize-then-fold log protocol (Σ floor(ln·10⁶) div n,
    * one exp at the edge — the `agg_atkinson_index` spelling), HM
    * via exact floored reciprocals r = 10¹² div q_milli (relative
    * quantization error < 5·10⁻⁸, identical in both engines) so
    * HM_milli = n·10¹² div Σr is pure integer algebra. The spec
    * pins the mean inequality. One grouped fold. */
  val aggGeometricHarmonic: QDef = q(
    "agg_geometric_harmonic",
    """WITH x AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(CAST(l_quantity AS DECIMAL(12,4)) * 1000 AS BIGINT)
      |      AS qm
      |  FROM lineitem
      |  WHERE CAST(CAST(l_quantity AS DECIMAL(12,4)) * 1000 AS BIGINT) > 0),
      |m AS (
      |  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qm) AS BIGINT) AS sq,
      |    CAST(SUM(CAST(FLOOR(ln(CAST(qm AS DOUBLE)) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS sl,
      |    CAST(SUM(1000000000000 // qm) AS BIGINT) AS sr
      |  FROM x GROUP BY flag)
      |SELECT flag AS l_returnflag, n,
      |  CAST(sq // n AS BIGINT) AS arith_milli,
      |  CAST(FLOOR(exp(CAST(sl // n AS DOUBLE) / 1000000)) AS BIGINT)
      |    AS geo_milli,
      |  CAST(n * 1000000000000 // sr AS BIGINT) AS harm_milli
      |FROM m ORDER BY 1""") { (s, d) =>
    val x = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_quantity AS DECIMAL(12,4)) * 1000 AS BIGINT)")
          .as("qm"))
      .filter(col("qm") > 0)
    val m = x.groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("qm")).as("sq"),
        sum(floor(log(col("qm").cast(DoubleType)) * 1000000)
          .cast(LongType)).as("sl"),
        sum(expr("1000000000000 div qm")).as("sr"))
    m.select(col("flag").as("l_returnflag"), col("n"),
        expr("CAST(sq div n AS BIGINT)").as("arith_milli"),
        expr("CAST(FLOOR(exp(CAST(sl div n AS DOUBLE) / 1000000))"
          + " AS BIGINT)").as("geo_milli"),
        expr("CAST(n * 1000000000000 div sr AS BIGINT)").as("harm_milli"))
      .orderBy(col("l_returnflag"))
  }

  /** Mixture entropy / effective domain count (r18b) — the
    * one-number diversity summary a data-mixing deck leads with:
    * Shannon entropy of the source mixture H = ln N − (Σ c·ln c)/N
    * through the quantize-then-fold log protocol (each term
    * c·floor(ln c·10⁶) exact), the EFFECTIVE number of domains
    * exp(H) (Hill number of order 1 — "this 20-source corpus mixes
    * like X equal sources"), and H normalized by ln(m) in ppm.
    * Complements the share table (`mix_domain_weighted`) and the
    * inequality trio with the information-theoretic view. One
    * source fold + a 1-row edge. */
  val mixEntropyEffectiveDomains: QDef = q(
    "mix_entropy_effective_domains",
    """WITH c AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source),
      |f AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(n) AS BIGINT)
      |      AS nd,
      |    CAST(SUM(n * CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS snl
      |  FROM c),
      |h AS (
      |  SELECT m, nd,
      |    CAST(FLOOR(ln(CAST(nd AS DOUBLE)) * 1000000) AS BIGINT)
      |      - snl // nd AS h_micro
      |  FROM f)
      |SELECT nd AS n_docs, m AS n_domains, h_micro,
      |  CAST(FLOOR(exp(CAST(h_micro AS DOUBLE) / 1000000) * 1000)
      |    AS BIGINT) AS eff_domains_milli,
      |  CASE WHEN m = 1 THEN NULL
      |    ELSE CAST(h_micro * 1000000
      |      // CAST(FLOOR(ln(CAST(m AS DOUBLE)) * 1000000) AS BIGINT)
      |      AS BIGINT) END AS h_norm_ppm
      |FROM h""") { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val f = c.agg(count(lit(1)).as("m"), sum(col("n")).as("nd"),
      sum(col("n") * floor(log(col("n").cast(DoubleType)) * 1000000)
        .cast(LongType)).as("snl"))
    val h = f.select(col("m"), col("nd"),
      (floor(log(col("nd").cast(DoubleType)) * 1000000).cast(LongType)
        - expr("snl div nd")).as("h_micro"))
    h.select(col("nd").as("n_docs"), col("m").as("n_domains"),
      col("h_micro"),
      expr("CAST(FLOOR(exp(CAST(h_micro AS DOUBLE) / 1000000) * 1000)"
        + " AS BIGINT)").as("eff_domains_milli"),
      when(col("m") === 1, lit(null).cast(LongType))
        .otherwise(expr("CAST(h_micro * 1000000"
          + " div CAST(FLOOR(ln(CAST(m AS DOUBLE)) * 1000000) AS BIGINT)"
          + " AS BIGINT)")).as("h_norm_ppm"))
  }

  /** Rich-club density (r18b) — do the highest-degree customers and
    * suppliers trade disproportionately with EACH OTHER? Over the
    * shared `tradeEb` bipartite edge set (ONE spelling with the
    * eight graph-family consumers): top-20 customers and top-20
    * suppliers by distinct-partner degree (deterministic (deg DESC,
    * key) order), the edge density among them vs the overall
    * bipartite density, and the rich-club ratio in milli. The top
    * sets are TakeOrdered(20) global sort-limits; the rich-edge
    * count is one broadcast double-semijoin over eb — never an
    * all-pairs anything. */
  val graphRichClub: QDef = q(
    "graph_rich_club",
    s"""WITH ${ClusterOps.tradeEbCte},
      |cd AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS deg FROM eb
      |  GROUP BY ck),
      |sd AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS deg FROM eb
      |  GROUP BY sk),
      |topc AS (SELECT ck FROM cd ORDER BY deg DESC, ck LIMIT 20),
      |tops AS (SELECT sk FROM sd ORDER BY deg DESC, sk LIMIT 20),
      |tot AS (
      |  SELECT CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_cust,
      |    CAST(COUNT(DISTINCT sk) AS BIGINT) AS n_supp,
      |    CAST(COUNT(*) AS BIGINT) AS n_edges
      |  FROM eb),
      |rich AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS rich_edges
      |  FROM eb JOIN topc ON topc.ck = eb.ck
      |    JOIN tops ON tops.sk = eb.sk)
      |SELECT tot.n_cust, tot.n_supp, tot.n_edges, rich.rich_edges,
      |  CAST(400 AS BIGINT) AS rich_possible,
      |  CAST(rich.rich_edges * 1000000 // 400 AS BIGINT)
      |    AS rich_density_ppm,
      |  CAST(tot.n_edges * 1000000 // (tot.n_cust * tot.n_supp)
      |    AS BIGINT) AS overall_density_ppm,
      |  CAST((rich.rich_edges * 1000000 // 400) * 1000
      |    // (tot.n_edges * 1000000 // (tot.n_cust * tot.n_supp))
      |    AS BIGINT) AS rich_club_ratio_milli
      |FROM tot CROSS JOIN rich""") { (s, d) =>
    // r19 batch 3 (guide §2.3): tot's two-distinct aggregate planned
    // an Expand over the ~587k-row eb cache (3× the rows through a
    // partial agg). The degree tables needed for the top-20 cuts
    // already determine every total exactly: n_cust = |cd|, n_supp =
    // |sd|, n_edges = Σ cd.deg (eb is duplicate-free) — so persist
    // the two node-sized degree tables and fold them instead.
    val eb = ClusterOps.tradeEb(s, d).persist()
    val cd = eb.groupBy(col("ck")).agg(count(lit(1)).as("deg")).persist()
    val sd = eb.groupBy(col("sk")).agg(count(lit(1)).as("deg")).persist()
    val topc = cd.orderBy(col("deg").desc, col("ck")).limit(20).select(col("ck"))
    val tops = sd.orderBy(col("deg").desc, col("sk")).limit(20).select(col("sk"))
    val tot = cd.agg(count(lit(1)).as("n_cust"), sum(col("deg")).cast(LongType).as("n_edges"))
      .crossJoin(broadcast(sd.agg(count(lit(1)).as("n_supp"))))
      .select(col("n_cust"), col("n_supp"), col("n_edges"))
    val rich = eb.join(broadcast(topc.select(col("ck").as("t_ck"))),
        col("t_ck") === col("ck"))
      .join(broadcast(tops.select(col("sk").as("t_sk"))),
        col("t_sk") === col("sk"))
      .agg(count(lit(1)).as("rich_edges"))
    tot.crossJoin(broadcast(rich))
      .select(col("n_cust"), col("n_supp"), col("n_edges"),
        col("rich_edges"), lit(400L).as("rich_possible"),
        expr("rich_edges * 1000000 div 400").as("rich_density_ppm"),
        expr("n_edges * 1000000 div (n_cust * n_supp)")
          .as("overall_density_ppm"),
        expr("(rich_edges * 1000000 div 400) * 1000"
          + " div (n_edges * 1000000 div (n_cust * n_supp))")
          .as("rich_club_ratio_milli"))
  }

  /** Laplace-mechanism histogram (r18b) — the ε-DP release that
    * completes the privacy family (randomized response = local DP,
    * ε-composition = budgeting, THIS = central-DP aggregate
    * release), graded deterministically: per-lang counts get
    * inverse-CDF Laplace noise b = Δ/ε = 1 from an md5 uniform
    * (u = (h%10⁶ + 0.5)/10⁶ halves away from the CDF poles;
    * noise = −sgn(u−½)·ln(1−2|u−½|), ONE identical ln float tree,
    * floor micro). Since lang histogram cells are DISJOINT, parallel
    * composition gives ε_total = 1 for the whole release — stated
    * as a graded column. Per lang: true count, uniform draw, noise,
    * noisy count, abs error (all micro). One lang fold + row-local
    * noise. */
  val privacyLaplaceHistogram: QDef = q(
    "privacy_laplace_histogram",
    """WITH c AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS true_n
      |  FROM documents GROUP BY lang),
      |u AS (
      |  SELECT lang, true_n,
      |    ('0x' || substr(md5('lap:' || lang), 1, 8))::BIGINT % 1000000
      |      AS u_micro
      |  FROM c),
      |nz AS (
      |  SELECT lang, true_n, u_micro,
      |    CAST(FLOOR((CASE WHEN u_micro + u_micro >= 1000000
      |        THEN -1.0 ELSE 1.0 END)
      |      * ln(1 - 2 * abs((u_micro + 0.5) / 1000000 - 0.5))
      |      * 1000000) AS BIGINT) AS noise_micro
      |  FROM u)
      |SELECT lang, true_n, u_micro, noise_micro,
      |  true_n * 1000000 + noise_micro AS noisy_micro,
      |  abs(noise_micro) AS abs_err_micro,
      |  CAST(1000000 AS BIGINT) AS eps_total_micro
      |FROM nz ORDER BY lang""") { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("true_n"))
    val u = c.withColumn("u_micro",
      conv(substring(md5(concat(lit("lap:"), col("lang"))), 1, 8), 16, 10)
        .cast(LongType) % 1000000)
    val nz = u.withColumn("noise_micro",
      expr("CAST(FLOOR((CASE WHEN u_micro + u_micro >= 1000000"
        + " THEN -1.0 ELSE 1.0 END)"
        + " * ln(1 - 2 * abs((u_micro + 0.5) / 1000000 - 0.5))"
        + " * 1000000) AS BIGINT)"))
    nz.select(col("lang"), col("true_n"), col("u_micro"),
        col("noise_micro"),
        (col("true_n") * 1000000L + col("noise_micro")).as("noisy_micro"),
        abs(col("noise_micro")).as("abs_err_micro"),
        lit(1000000L).as("eps_total_micro"))
      .orderBy(col("lang"))
  }

  /** Simpson diversity per language (r18b) — the order-2 companion
    * to the order-1 entropy key (`mix_entropy_effective_domains`):
    * over each language's token frequency distribution, Simpson's
    * λ = Σc(c−1)/(N(N−1)) (the probability two random tokens are
    * the same type — EXACT rational, no sampling), Gini–Simpson
    * 1−λ, and the inverse-Simpson effective type count (Hill number
    * of order 2) in milli. Shuffles: one (lang, token) wordcount
    * (map-side combined, vocabulary-sized) + one lang fold. */
  val corpusSimpsonDiversity: QDef = q(
    "corpus_simpson_diversity",
    """WITH tc AS (
      |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  WHERE tok <> '' GROUP BY lang, tok),
      |f AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CAST(c AS HUGEINT) * (c - 1)) AS BIGINT) AS s2
      |  FROM tc GROUP BY lang)
      |SELECT lang, n_types, n_tokens,
      |  CASE WHEN n_tokens < 2 THEN NULL
      |    ELSE CAST(s2 * 1000000 // (n_tokens * (n_tokens - 1))
      |      AS BIGINT) END AS simpson_ppm,
      |  CASE WHEN n_tokens < 2 THEN NULL
      |    ELSE CAST(1000000 - s2 * 1000000 // (n_tokens * (n_tokens - 1))
      |      AS BIGINT) END AS gini_simpson_ppm,
      |  CASE WHEN s2 = 0 THEN NULL
      |    ELSE CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) * 1000
      |      // s2 AS BIGINT) END AS inv_simpson_milli
      |FROM f ORDER BY lang""") { (s, d) =>
    val tc = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
    val f = tc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(col("c").cast(dec) * (col("c") - 1)).cast(LongType).as("s2"))
    f.select(col("lang"), col("n_types"), col("n_tokens"),
        when(col("n_tokens") < 2, lit(null).cast(LongType))
          .otherwise(expr("CAST(s2 * 1000000"
            + " div (n_tokens * (n_tokens - 1)) AS BIGINT)"))
          .as("simpson_ppm"),
        when(col("n_tokens") < 2, lit(null).cast(LongType))
          .otherwise(expr("CAST(1000000 - s2 * 1000000"
            + " div (n_tokens * (n_tokens - 1)) AS BIGINT)"))
          .as("gini_simpson_ppm"),
        when(col("s2") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(CAST(n_tokens AS DECIMAL(38,0))"
            + " * (n_tokens - 1) * 1000 div s2 AS BIGINT)"))
          .as("inv_simpson_milli"))
      .orderBy(col("lang"))
  }

  /** Bartlett's test for equal variances (r18b) — the parametric
    * twin of the graded robust `stats_levene_bf`: over the five
    * event types' value distributions,
    * χ² = [(N−k)·ln(Sp²) − Σ(nᵢ−1)·ln(Sᵢ²)] / C with the standard
    * correction C. Per-group sums are EXACT DECIMAL(38) partials;
    * each variance is a FLOORED milli-quantized integer (the
    * transcendental-protocol rule: every ln argument is
    * integer-backed AND its output ROUND(·,6)-quantized — the
    * `drift_unigram_jsd` protocol; the ×1000 offsets cancel up to
    * that quantization because Σ(nᵢ−1) = N−k), and the logs + C
    * fold in FIXED order on the
    * 1-row frame (the `ts_ljung_box` discipline — a float SUM
    * aggregate would be order-dependent). Zero/absent variances
    * guard to NULL. χ²₄ 5%-critical 9.487729. Output is the 1-row
    * verdict. */
  val statsBartlett: QDef = q(
    "stats_bartlett",
    """WITH x AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT) AS v
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(v) AS HUGEINT) AS s1,
      |    CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
      |  FROM x GROUP BY event_type),
      |g AS (
      |  SELECT event_type, n,
      |    CAST((n * s2 - s1 * s1) * 1000
      |      // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS s2i
      |  FROM m),
      |w AS (
      |  SELECT
      |    MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
      |    MAX(CASE WHEN event_type = 'error' THEN n END) AS n2,
      |    MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n3,
      |    MAX(CASE WHEN event_type = 'signup' THEN n END) AS n4,
      |    MAX(CASE WHEN event_type = 'view' THEN n END) AS n5,
      |    MAX(CASE WHEN event_type = 'click' THEN s2i END) AS v1,
      |    MAX(CASE WHEN event_type = 'error' THEN s2i END) AS v2,
      |    MAX(CASE WHEN event_type = 'purchase' THEN s2i END) AS v3,
      |    MAX(CASE WHEN event_type = 'signup' THEN s2i END) AS v4,
      |    MAX(CASE WHEN event_type = 'view' THEN s2i END) AS v5
      |  FROM g),
      |t AS (
      |  SELECT n1 + n2 + n3 + n4 + n5 AS nn,
      |    ((n1 - 1) * v1 + (n2 - 1) * v2 + (n3 - 1) * v3 + (n4 - 1) * v4
      |      + (n5 - 1) * v5) // (n1 + n2 + n3 + n4 + n5 - 5) AS sp2,
      |    (n1 - 1) * ROUND(ln(CAST(v1 AS DOUBLE)), 6) + (n2 - 1)
      |      * ROUND(ln(CAST(v2 AS DOUBLE)), 6)
      |      + (n3 - 1) * ROUND(ln(CAST(v3 AS DOUBLE)), 6)
      |      + (n4 - 1) * ROUND(ln(CAST(v4 AS DOUBLE)), 6)
      |      + (n5 - 1) * ROUND(ln(CAST(v5 AS DOUBLE)), 6) AS sl,
      |    1.0 / (n1 - 1) + 1.0 / (n2 - 1) + 1.0 / (n3 - 1)
      |      + 1.0 / (n4 - 1) + 1.0 / (n5 - 1) AS sr,
      |    LEAST(v1, v2, v3, v4, v5) AS vmin
      |  FROM w)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(5 AS BIGINT) AS k,
      |  CASE WHEN vmin <= 0 THEN NULL ELSE
      |    CAST(FLOOR(((nn - 5) * ROUND(ln(CAST(sp2 AS DOUBLE)), 6) - sl)
      |      / (1 + (sr - 1.0 / (nn - 5)) / 12) * 1000000) AS BIGINT)
      |    END AS chi2_micro,
      |  CASE WHEN vmin <= 0 THEN NULL ELSE
      |    FLOOR(((nn - 5) * ROUND(ln(CAST(sp2 AS DOUBLE)), 6) - sl)
      |      / (1 + (sr - 1.0 / (nn - 5)) / 12) * 1000000) > 9487729
      |    END AS significant
      |FROM t""") { (s, d) =>
    val x = Tables.events(s, d).select(col("event_type"),
      expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)").as("v"))
    val m = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("s1"),
        sum(col("v").cast(dec) * col("v")).as("s2"))
    val g = m.select(col("event_type"), col("n"),
      expr("CAST((CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1) * 1000"
        + " div (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)")
        .as("s2i"))
    def pick(t: String, c: String, as0: String): Column =
      max(when(col("event_type") === t, col(c))).as(as0)
    val w = g.agg(
      pick("click", "n", "n1"), pick("error", "n", "n2"),
      pick("purchase", "n", "n3"), pick("signup", "n", "n4"),
      pick("view", "n", "n5"),
      pick("click", "s2i", "v1"), pick("error", "s2i", "v2"),
      pick("purchase", "s2i", "v3"), pick("signup", "s2i", "v4"),
      pick("view", "s2i", "v5"))
    val t = w.select(
      expr("n1 + n2 + n3 + n4 + n5").as("nn"),
      expr("((n1 - 1) * v1 + (n2 - 1) * v2 + (n3 - 1) * v3"
        + " + (n4 - 1) * v4 + (n5 - 1) * v5)"
        + " div (n1 + n2 + n3 + n4 + n5 - 5)").as("sp2"),
      expr("(n1 - 1) * ROUND(ln(CAST(v1 AS DOUBLE)), 6) + (n2 - 1)"
        + " * ROUND(ln(CAST(v2 AS DOUBLE)), 6)"
        + " + (n3 - 1) * ROUND(ln(CAST(v3 AS DOUBLE)), 6)"
        + " + (n4 - 1) * ROUND(ln(CAST(v4 AS DOUBLE)), 6)"
        + " + (n5 - 1) * ROUND(ln(CAST(v5 AS DOUBLE)), 6)").as("sl"),
      expr("1.0 / (n1 - 1) + 1.0 / (n2 - 1) + 1.0 / (n3 - 1)"
        + " + 1.0 / (n4 - 1) + 1.0 / (n5 - 1)").as("sr"),
      expr("LEAST(v1, v2, v3, v4, v5)").as("vmin"))
    t.select(col("nn").cast(LongType).as("n"), lit(5L).as("k"),
        when(col("vmin") <= 0, lit(null).cast(LongType))
          .otherwise(expr("CAST(FLOOR(((nn - 5)"
            + " * ROUND(ln(CAST(sp2 AS DOUBLE)), 6)"
            + " - sl) / (1 + (sr - 1.0 / (nn - 5)) / 12) * 1000000)"
            + " AS BIGINT)")).as("chi2_micro"))
      .withColumn("significant",
        when(col("chi2_micro").isNull, lit(null).cast("boolean"))
          .otherwise(col("chi2_micro") > 9487729L))
  }

  /** Token-set fingerprint cluster purity (r18b) — quality audit of
    * content-fingerprint dedup clustering: documents cluster by the
    * md5 of their SORTED DISTINCT token set (byte-identical strings
    * are a special case; the fixture's near-duplicates share token
    * sets while differing byte-wise, so this is the clustering that
    * actually fires — the hash, never the raw string, keys the
    * shuffle, the 100 TB spelling), cluster sizes bucket into
    * {1, 2, 3–4, 5–8, 9+}, and each bucket grades cluster count,
    * document mass, and mean LANGUAGE PURITY (majority-lang share
    * per cluster, floor-ppm) — low purity says the shared content
    * crosses languages, i.e. boilerplate, exactly what a curation
    * pass needs surfaced. Shuffles: one (fingerprint, lang) count,
    * one fingerprint fold, one bucket fold. */
  val dedupClusterPurity: QDef = q(
    "dedup_cluster_purity",
    """WITH hl AS (
      |  SELECT md5(array_to_string(list_sort(list_distinct(
      |      string_split(text, ' '))), ' ')) AS h,
      |    lang, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2),
      |cl AS (
      |  SELECT h, CAST(SUM(c) AS BIGINT) AS sz,
      |    CAST(MAX(c) AS BIGINT) AS maxc
      |  FROM hl GROUP BY h),
      |b AS (
      |  SELECT CASE WHEN sz = 1 THEN '1' WHEN sz = 2 THEN '2'
      |    WHEN sz <= 4 THEN '3-4' WHEN sz <= 8 THEN '5-8'
      |    ELSE '9+' END AS size_bucket,
      |    sz, maxc * 1000000 // sz AS purity_ppm
      |  FROM cl)
      |SELECT size_bucket, CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(sz) AS BIGINT) AS n_docs,
      |  CAST(SUM(purity_ppm) // COUNT(*) AS BIGINT) AS mean_purity_ppm
      |FROM b GROUP BY size_bucket ORDER BY size_bucket""") { (s, d) =>
    val hl = Tables.documents(s, d)
      .select(md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " "))))).as("h"),
        col("lang"))
      .groupBy(col("h"), col("lang")).agg(count(lit(1)).as("c"))
    val cl = hl.groupBy(col("h"))
      .agg(sum(col("c")).as("sz"), max(col("c")).as("maxc"))
    val b = cl.select(
      when(col("sz") === 1, "1").when(col("sz") === 2, "2")
        .when(col("sz") <= 4, "3-4").when(col("sz") <= 8, "5-8")
        .otherwise("9+").as("size_bucket"),
      col("sz"), expr("maxc * 1000000 div sz").as("purity_ppm"))
    b.groupBy(col("size_bucket"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
        expr("CAST(SUM(purity_ppm) div COUNT(*) AS BIGINT)")
          .as("mean_purity_ppm"))
      .orderBy(col("size_bucket"))
  }

  /** Poisson dispersion index (r18b) — are daily event counts
    * Poisson (D ≈ 1), clumped (D > 1), or over-regular (D < 1)?
    * Per type over the COMPLETE day matrix (absent days are true
    * zeros — the `stats_friedman_test` convention):
    * D = s²/x̄ = (nΣc² − (Σc)²)/((n−1)·Σc) — ONE exact rational,
    * and the χ² form (n−1)·D is exact too. Flags use the classic
    * field bounds D > 1.5 / D < 0.5 (df-free, documented heuristic
    * rather than a quantile that would need an inverse-χ² float).
    * One day agg + complete-matrix join + type fold. */
  val tsPoissonDispersion: QDef = q(
    "ts_poisson_dispersion",
    """WITH dt AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT day FROM dt),
      |types AS (SELECT DISTINCT event_type FROM dt),
      |cm AS (
      |  SELECT t.event_type, COALESCE(dt.cnt, 0) AS cnt
      |  FROM days d CROSS JOIN types t
      |  LEFT JOIN dt ON dt.day = d.day AND dt.event_type = t.event_type),
      |f AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cnt) AS BIGINT) AS sc,
      |    CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS scc
      |  FROM cm GROUP BY event_type)
      |SELECT event_type, n AS n_days,
      |  CAST(sc * 1000 // n AS BIGINT) AS mean_milli,
      |  CASE WHEN sc = 0 OR n < 2 THEN NULL
      |    ELSE CAST((n * scc - CAST(sc AS HUGEINT) * sc) * 1000
      |      // ((n - 1) * CAST(sc AS HUGEINT)) AS BIGINT) END
      |    AS dispersion_milli,
      |  CASE WHEN sc = 0 THEN NULL
      |    ELSE CAST((n * scc - CAST(sc AS HUGEINT) * sc) * 1000000
      |      // CAST(sc AS HUGEINT) AS BIGINT) END AS chi2_micro,
      |  CASE WHEN sc = 0 OR n < 2 THEN NULL
      |    ELSE (n * scc - CAST(sc AS HUGEINT) * sc) * 1000
      |      // ((n - 1) * CAST(sc AS HUGEINT)) > 1500 END
      |    AS overdispersed,
      |  CASE WHEN sc = 0 OR n < 2 THEN NULL
      |    ELSE (n * scc - CAST(sc AS HUGEINT) * sc) * 1000
      |      // ((n - 1) * CAST(sc AS HUGEINT)) < 500 END
      |    AS underdispersed
      |FROM f ORDER BY event_type""") { (s, d) =>
    val dt = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val days = dt.select(col("day")).distinct()
    val types = dt.select(col("event_type")).distinct()
    val cm = days.crossJoin(broadcast(types))
      .join(dt.select(col("day").as("j_day"),
          col("event_type").as("j_type"), col("cnt")),
        col("j_day") === col("day") && col("j_type") === col("event_type"),
        "left")
      .select(col("event_type"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val f = cm.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sc"),
        sum(col("cnt").cast(dec) * col("cnt")).as("scc"))
    val disp = "(n * scc - CAST(sc AS DECIMAL(38,0)) * sc) * 1000" +
      " div ((n - 1) * CAST(sc AS DECIMAL(38,0)))"
    f.select(col("event_type"), col("n").as("n_days"),
        expr("CAST(sc * 1000 div n AS BIGINT)").as("mean_milli"),
        when(col("sc") === 0 || col("n") < 2, lit(null).cast(LongType))
          .otherwise(expr(s"CAST($disp AS BIGINT)"))
          .as("dispersion_milli"),
        when(col("sc") === 0, lit(null).cast(LongType))
          .otherwise(expr("CAST((n * scc - CAST(sc AS DECIMAL(38,0))"
            + " * sc) * 1000000 div CAST(sc AS DECIMAL(38,0))"
            + " AS BIGINT)")).as("chi2_micro"),
        when(col("sc") === 0 || col("n") < 2, lit(null).cast(BooleanType))
          .otherwise(expr(s"$disp > 1500")).as("overdispersed"),
        when(col("sc") === 0 || col("n") < 2, lit(null).cast(BooleanType))
          .otherwise(expr(s"$disp < 500")).as("underdispersed"))
      .orderBy(col("event_type"))
  }

  /** Theil between/within decomposition by region (r18b) — the
    * property that makes Theil THE inequality index for hierarchies:
    * T_total = T_between + Σ_r share_r·T_within_r EXACTLY (Theil
    * 1967), graded here across the region→nation→customer rollup on
    * the SAME `custRevCtes` base as the nation-level trio (ONE
    * spelling, now `private[ops]`). Per region: customer count,
    * revenue mass, within-region Theil (the house per-row
    * floor(ratio·ln ratio·10⁶) fold), the between term
    * (S_r/S)·ln(S_r·N/(S·N_r)), and the share-weighted within
    * contribution; the corpus-level T_total / ΣB / ΣW ride every
    * row as broadcast fold columns, and the spec pins additivity to
    * within quantization. Shuffles: the customer agg + broadcast
    * dims + one region fold + two 1-row folds. */
  val reportTheilBetweenWithin: QDef = q(
    "report_theil_between_within",
    s"""WITH ${R18Ops.custRevCtes},
      |rn AS (
      |  SELECT n.n_name, r.r_name
      |  FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey),
      |cr AS (
      |  SELECT rn.r_name, cn.x
      |  FROM cn JOIN rn ON rn.n_name = cn.n_name),
      |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
      |  CAST(SUM(x) AS BIGINT) AS ss FROM cr),
      |f AS (
      |  SELECT r_name, CAST(COUNT(*) AS BIGINT) AS nr,
      |    CAST(SUM(x) AS BIGINT) AS sr
      |  FROM cr GROUP BY r_name),
      |tw AS (
      |  SELECT cr.r_name,
      |    CAST(SUM(CAST(floor((CAST(cr.x * f.nr AS DOUBLE) / f.sr)
      |      * ln(CAST(cr.x * f.nr AS DOUBLE) / f.sr) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS st
      |  FROM cr JOIN f ON f.r_name = cr.r_name GROUP BY cr.r_name),
      |tt AS (
      |  SELECT CAST(SUM(CAST(floor((CAST(cr.x * g.nn AS DOUBLE) / g.ss)
      |      * ln(CAST(cr.x * g.nn AS DOUBLE) / g.ss) * 1000000)
      |      AS BIGINT)) // MAX(g.nn) AS BIGINT) AS t_total
      |  FROM cr CROSS JOIN g),
      |per AS (
      |  SELECT f.r_name, f.nr, f.sr,
      |    CAST(tw.st // f.nr AS BIGINT) AS theil_within_micro,
      |    CAST(floor((CAST(f.sr AS DOUBLE) / g.ss)
      |      * ln(CAST(f.sr AS DOUBLE) * g.nn
      |        / (CAST(g.ss AS DOUBLE) * f.nr)) * 1000000) AS BIGINT)
      |      AS between_term_micro,
      |    CAST(CAST(f.sr AS HUGEINT) * (tw.st // f.nr) // g.ss AS BIGINT)
      |      AS weighted_within_micro
      |  FROM f JOIN tw ON tw.r_name = f.r_name CROSS JOIN g),
      |tot AS (
      |  SELECT CAST(SUM(between_term_micro) AS BIGINT) AS t_between,
      |    CAST(SUM(weighted_within_micro) AS BIGINT) AS t_within
      |  FROM per)
      |SELECT per.r_name, per.nr AS n_customers, per.sr AS sum_cents,
      |  per.theil_within_micro, per.between_term_micro,
      |  per.weighted_within_micro, tt.t_total AS theil_total_micro,
      |  tot.t_between AS theil_between_micro,
      |  tot.t_within AS theil_within_total_micro
      |FROM per CROSS JOIN tt CROSS JOIN tot
      |ORDER BY per.r_name""") { (s, d) =>
    val rn = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("n_name").as("rn_name"), col("r_name"))
    val cr = R18Ops.custRevByNation(s, d)
      .join(broadcast(rn), col("rn_name") === col("n_name"))
      .select(col("r_name"), col("x"))
      .persist()
    val g = cr.agg(count(lit(1)).as("nn"),
      sum(col("x")).cast(LongType).as("ss"))
    val f = cr.groupBy(col("r_name").as("f_name"))
      .agg(count(lit(1)).as("nr"), sum(col("x")).cast(LongType).as("sr"))
    val ratioR = (col("x") * col("nr")).cast(DoubleType) / col("sr")
    val tw = cr.join(broadcast(f), col("f_name") === col("r_name"))
      .select(col("r_name"),
        floor(ratioR * log(ratioR) * 1000000).cast(LongType).as("term"))
      .groupBy(col("r_name")).agg(sum(col("term")).as("st"))
    val ratioG = (col("x") * col("nn")).cast(DoubleType) / col("ss")
    val tt = cr.crossJoin(broadcast(g))
      .select(floor(ratioG * log(ratioG) * 1000000).cast(LongType)
        .as("term"), col("nn"))
      .agg(expr("CAST(SUM(term) div MAX(nn) AS BIGINT)").as("t_total"))
    val per = f.join(tw, col("r_name") === col("f_name"))
      .crossJoin(broadcast(g))
      .select(col("r_name"), col("nr"), col("sr"),
        expr("CAST(st div nr AS BIGINT)").as("theil_within_micro"),
        floor((col("sr").cast(DoubleType) / col("ss"))
          * log(col("sr").cast(DoubleType) * col("nn")
            / (col("ss").cast(DoubleType) * col("nr"))) * 1000000)
          .cast(LongType).as("between_term_micro"),
        expr("CAST(CAST(sr AS DECIMAL(38,0)) * (st div nr) div ss"
          + " AS BIGINT)").as("weighted_within_micro"))
    val tot = per.agg(sum(col("between_term_micro")).cast(LongType)
      .as("t_between"),
      sum(col("weighted_within_micro")).cast(LongType).as("t_within"))
    per.crossJoin(broadcast(tt)).crossJoin(broadcast(tot))
      .select(col("r_name"), col("nr").as("n_customers"),
        col("sr").as("sum_cents"), col("theil_within_micro"),
        col("between_term_micro"), col("weighted_within_micro"),
        col("t_total").as("theil_total_micro"),
        col("t_between").as("theil_between_micro"),
        col("t_within").as("theil_within_total_micro"))
      .orderBy(col("r_name"))
  }

  /** Parkinson high–low volatility (r18b) — the range-based daily
    * volatility estimator (Parkinson 1980), 5× more efficient than
    * close-to-close on the same data: per type,
    * σ²_P = (1/(4·ln 2))·mean(ln(H/L)²) over daily value ranges.
    * Per-day term = floor(ln(H/L)²·10⁶) (floor-protected double
    * tree, H/L from exact cents), the mean is an exact integer
    * fold, and the 1/(4 ln 2) factor is the INTEGER constant
    * 2772588 (= floor(4·ln 2·10⁶)) so the final step is one more
    * exact division. Zero/degenerate lows guard out. One day agg +
    * one type fold. */
  val tsParkinsonVolatility: QDef = q(
    "ts_parkinson_volatility",
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(MAX(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS h,
      |    CAST(MIN(CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT))
      |      AS BIGINT) AS l
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type,
      |    CAST(floor(ln(CAST(h AS DOUBLE) / l)
      |      * ln(CAST(h AS DOUBLE) / l) * 1000000) AS BIGINT) AS term
      |  FROM d WHERE l > 0 AND h > l),
      |f AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(term) AS BIGINT) AS st
      |  FROM t GROUP BY event_type)
      |SELECT event_type, n_days,
      |  CAST(st // n_days AS BIGINT) AS mean_sq_logrange_micro,
      |  CAST(st * 1000000 // n_days // 2772588 AS BIGINT)
      |    AS parkinson_var_micro
      |FROM f ORDER BY event_type""") { (s, d) =>
    val dd = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("day"))
      .agg(max(expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)"))
        .as("h"),
        min(expr("CAST(CAST(value AS DECIMAL(12,4)) * 100 AS BIGINT)"))
        .as("l"))
    val t = dd.filter(col("l") > 0 && col("h") > col("l"))
      .select(col("event_type"),
        floor(log(col("h").cast(DoubleType) / col("l"))
          * log(col("h").cast(DoubleType) / col("l")) * 1000000)
          .cast(LongType).as("term"))
    t.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("term")).as("st"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(st div n_days AS BIGINT)")
          .as("mean_sq_logrange_micro"),
        expr("CAST(st * 1000000 div n_days div 2772588 AS BIGINT)")
          .as("parkinson_var_micro"))
      .orderBy(col("event_type"))
  }

  /** Per-source KL divergence from the corpus (r18b) — "how
    * distinctive is each feed's language?": KL(P_source ∥ P_corpus)
    * = Σ_t (c_st/N_s)·ln(c_st·N/(N_s·c_t)) over token unigrams.
    * Every per-type term is floor-protected
    * (floor(p·ln(p/q)·10⁶)); absent types contribute nothing (the
    * source distribution's support is a subset of the corpus's by
    * construction, so the divergence is always finite). The
    * companion to `drift_unigram_jsd` (halves) and `corpus_zipf` —
    * the lineage-level distribution audit. Shuffles: one
    * (source, token) wordcount + a broadcast vocabulary join + one
    * source fold. */
  val corpusSourceKl: QDef = q(
    "corpus_source_kl",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |st AS (
      |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok WHERE tok <> '' GROUP BY source, tok),
      |ct AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS ct FROM st
      |  GROUP BY tok),
      |ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
      |  CAST(COUNT(*) AS BIGINT) AS n_types
      |  FROM st GROUP BY source),
      |g AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM st),
      |terms AS (
      |  SELECT st.source,
      |    CAST(floor((CAST(st.c AS DOUBLE) / ns.n_s)
      |      * ln(CAST(st.c AS DOUBLE) * g.nn
      |        / (CAST(ns.n_s AS DOUBLE) * ct.ct)) * 1000000) AS BIGINT)
      |      AS term
      |  FROM st JOIN ct ON ct.tok = st.tok
      |  JOIN ns ON ns.source = st.source CROSS JOIN g)
      |SELECT ns.source, ns.n_s AS n_tokens, ns.n_types,
      |  CAST(SUM(terms.term) AS BIGINT) AS kl_micro
      |FROM terms JOIN ns ON ns.source = terms.source
      |GROUP BY ns.source, ns.n_s, ns.n_types
      |ORDER BY ns.source""") { (s, d) =>
    val st = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .persist()
    val ct = st.groupBy(col("tok").as("c_tok"))
      .agg(sum(col("c")).cast(LongType).as("ct"))
    val ns = st.groupBy(col("source").as("n_src"))
      .agg(sum(col("c")).cast(LongType).as("n_s"),
        count(lit(1)).as("n_types"))
    val g = st.agg(sum(col("c")).cast(LongType).as("nn"))
    val terms = st.join(broadcast(ct), col("c_tok") === col("tok"))
      .join(broadcast(ns), col("n_src") === col("source"))
      .crossJoin(broadcast(g))
      .select(col("source"), col("n_s"), col("n_types"),
        floor((col("c").cast(DoubleType) / col("n_s"))
          * log(col("c").cast(DoubleType) * col("nn")
            / (col("n_s").cast(DoubleType) * col("ct"))) * 1000000)
          .cast(LongType).as("term"))
    terms.groupBy(col("source"), col("n_s"), col("n_types"))
      .agg(sum(col("term")).cast(LongType).as("kl_micro"))
      .select(col("source"), col("n_s").as("n_tokens"), col("n_types"),
        col("kl_micro"))
      .orderBy(col("source"))
  }

  /** Hill tail-index estimator (r18b) — is per-user activity
    * heavy-tailed, and how heavy? Over the k = 50 most active
    * users (deterministic (count DESC, user) order),
    * 1/α̂ = mean_{i<k} ln(x_(i)) − ln(x_(k)) (Hill 1975) with every
    * log floor-quantized to micro BEFORE the fold (integer
    * algebra after), and α̂ in milli as one exact division. The
    * top-k set is a TakeOrdered(50); ranks inside it come from a
    * broadcast 50×50 self-join (no unpartitioned window). The
    * statistic that decides whether user-level quotas or sampling
    * caps are needed at 100 TB. */
  val eventsHillTailIndex: QDef = q(
    "events_hill_tail_index",
    """WITH u AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY user_id),
      |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM u),
      |top AS (SELECT user_id, c FROM u ORDER BY c DESC, user_id
      |  LIMIT 50),
      |rk AS (
      |  SELECT a.user_id, a.c,
      |    CAST(1 + COUNT(b.user_id) AS BIGINT) AS r
      |  FROM top a LEFT JOIN top b ON b.c > a.c
      |    OR (b.c = a.c AND b.user_id < a.user_id)
      |  GROUP BY a.user_id, a.c),
      |kk AS (SELECT CAST(MAX(r) AS BIGINT) AS k FROM rk),
      |xk AS (SELECT CAST(MAX(c) AS BIGINT) AS xkc FROM rk, kk
      |  WHERE r = kk.k),
      |hl AS (
      |  SELECT CAST(SUM(CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS sl,
      |    CAST(COUNT(*) AS BIGINT) AS km1
      |  FROM rk, kk WHERE r < kk.k)
      |SELECT nu.n_users, kk.k, xk.xkc AS xk_count,
      |  CAST(hl.sl // hl.km1
      |    - floor(ln(CAST(xk.xkc AS DOUBLE)) * 1000000) AS BIGINT)
      |    AS inv_alpha_micro,
      |  CASE WHEN hl.sl // hl.km1
      |      - floor(ln(CAST(xk.xkc AS DOUBLE)) * 1000000) <= 0 THEN NULL
      |    ELSE CAST(1000000000 // (hl.sl // hl.km1
      |      - CAST(floor(ln(CAST(xk.xkc AS DOUBLE)) * 1000000)
      |        AS BIGINT)) AS BIGINT) END AS alpha_milli
      |FROM nu CROSS JOIN kk CROSS JOIN xk CROSS JOIN hl""") { (s, d) =>
    val u = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
    val nu = u.agg(count(lit(1)).as("n_users"))
    val top = u.orderBy(col("c").desc, col("user_id")).limit(50)
      .persist()
    val rk = top.as("a")
      .join(broadcast(top.select(col("c").as("b_c"),
          col("user_id").as("b_u"))),
        col("b_c") > col("a.c") ||
          (col("b_c") === col("a.c") && col("b_u") < col("a.user_id")),
        "left")
      .groupBy(col("a.user_id").as("user_id"), col("a.c").as("c"))
      .agg((lit(1L) + count(col("b_u"))).as("r"))
      .persist()
    val kk = rk.agg(max(col("r")).as("k"))
    val xk = rk.crossJoin(broadcast(kk)).filter(col("r") === col("k"))
      .agg(max(col("c")).as("xkc"))
    val hl = rk.crossJoin(broadcast(kk)).filter(col("r") < col("k"))
      .agg(sum(floor(log(col("c").cast(DoubleType)) * 1000000)
        .cast(LongType)).cast(LongType).as("sl"),
        count(lit(1)).as("km1"))
    nu.crossJoin(broadcast(kk)).crossJoin(broadcast(xk))
      .crossJoin(broadcast(hl))
      .select(col("n_users"), col("k"), col("xkc").as("xk_count"),
        expr("CAST(sl div km1"
          + " - floor(ln(CAST(xkc AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("inv_alpha_micro"),
        expr("CASE WHEN sl div km1"
          + " - floor(ln(CAST(xkc AS DOUBLE)) * 1000000) <= 0 THEN NULL"
          + " ELSE CAST(1000000000 div (sl div km1"
          + " - CAST(floor(ln(CAST(xkc AS DOUBLE)) * 1000000)"
          + " AS BIGINT)) AS BIGINT) END").as("alpha_milli"))
  }

  /** Windowed moving-average TTR, MATTR-style (r18b) — the robust
    * lexical-diversity statistic (Covington & McFall 2010): the
    * corpus-global type/token ratio (`corpus_type_token_ratio`)
    * collapses as N grows, so per language the token stream (doc_id,
    * position order) is cut into FIXED 50-token windows and the
    * mean distinct-type share per full window is graded in ppm —
    * comparable across languages of any size. Window membership is
    * exact integer position arithmetic (global position = exclusive
    * doc-offset prefix + in-doc position, the bucketed-prefix
    * discipline keyed by language); distinct-per-window is one
    * (lang, window, type) count. */
  val corpusMattrWindowed: QDef = q(
    "corpus_mattr_windowed",
    """WITH dt AS (
      |  SELECT lang, doc_id, CAST(len(list_filter(string_split(text, ' '),
      |    t -> t <> '')) AS BIGINT) AS ntok
      |  FROM documents),
      |off AS (
      |  SELECT lang, doc_id, ntok,
      |    CAST(COALESCE(SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS base
      |  FROM dt),
      |tok0 AS (
      |  SELECT lang, doc_id,
      |    unnest(string_split(text, ' ')) AS tok,
      |    generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents),
      |tok AS (
      |  SELECT lang, doc_id, tok, CAST(i AS BIGINT) AS pos_in_doc
      |  FROM tok0 WHERE tok <> ''),
      |pos AS (
      |  SELECT tok.lang, tok.tok,
      |    (off.base + row_number() OVER (PARTITION BY tok.lang,
      |      tok.doc_id ORDER BY tok.pos_in_doc) - 1) AS gpos
      |  FROM tok JOIN off ON off.lang = tok.lang
      |    AND off.doc_id = tok.doc_id),
      |w AS (
      |  SELECT lang, gpos // 50 AS win, tok FROM pos),
      |full_w AS (
      |  SELECT lang, win, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |    CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
      |  FROM w GROUP BY lang, win)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(n_types) * 1000000 // SUM(n_tok) AS BIGINT)
      |    AS mattr_ppm
      |FROM full_w WHERE n_tok = 50
      |GROUP BY lang ORDER BY lang""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val dt = docs.select(col("lang"), col("doc_id"),
      size(filter(split(col("text"), " "),
        t => t =!= "")).cast(LongType).as("ntok"))
    // per-lang exclusive doc-offset prefix (lang-partitioned window
    // over doc rows — doc-count-sized partitions)
    val wOff = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = dt.withColumn("base",
      coalesce(sum(col("ntok")).over(wOff), lit(0L)))
      .select(col("lang").as("o_lang"), col("doc_id").as("o_doc"),
        col("base"))
    val tok = docs.select(col("lang"), col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pid", "tok")))
      .filter(col("tok") =!= "")
    val wDoc = Window.partitionBy(col("lang"), col("doc_id"))
      .orderBy(col("pid"))
    val pos = tok.join(off, col("o_lang") === col("lang") &&
        col("o_doc") === col("doc_id"))
      .withColumn("gpos",
        col("base") + row_number().over(wDoc) - 1)
    val fullW = pos.select(col("lang"), expr("gpos div 50").as("win"),
        col("tok"))
      .groupBy(col("lang"), col("win"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok"))
        .as("n_types"))
    fullW.filter(col("n_tok") === 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_windows"),
        expr("CAST(SUM(n_types) * 1000000 div SUM(n_tok) AS BIGINT)")
          .as("mattr_ppm"))
      .orderBy(col("lang"))
  }

  val all: Seq[QDef] = Seq(
    textGopherRules, packPaddingWasteSweep, statsJarqueBera,
    statsKruskalWallis, aggTrimmedMean, shardConsistentHashMoves,
    sampleClusterTwostage, winRsiSma, winStochasticOsc, opsQueueingMm1,
    statsFriedmanTest, evalKrippendorffAlpha, multimodalAspectBuckets,
    statsBhFdr, tsEwmaCrossover, annPqAdcRecall, sketchAmsF2,
    aggGeometricHarmonic, mixEntropyEffectiveDomains, graphRichClub,
    privacyLaplaceHistogram, corpusSimpsonDiversity, statsBartlett,
    dedupClusterPurity, tsPoissonDispersion, reportTheilBetweenWithin,
    tsParkinsonVolatility, corpusSourceKl, eventsHillTailIndex,
    corpusMattrWindowed)
}
