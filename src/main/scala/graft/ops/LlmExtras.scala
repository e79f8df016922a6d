package graft.ops

import graft.{QDef, Tables}
import graft.QDef.q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-path LLM-pipeline operators beyond SURVEY §2.10's core set:
  * sketch-based near-dedup (MinHash-LSH, SimHash), embedding-space
  * near-dup, and text analysis (language-ID, quality scoring,
  * fingerprinting), plus an IVF-style ANN probe.
  *
  * These are the formulations that survive 100 TB where the blocked
  * quadratic join (`dedup_near_jaccard`) cannot: LSH banding turns
  * all-pairs similarity into an equality join on band signatures
  * (shuffle on signature, candidates only within buckets), and IVF
  * routing prunes the ANN scan to one partition of the vector table.
  *
  * Determinism: every sketch is built from md5 (identical hex output
  * in Spark and DuckDB) and integer arithmetic — no float
  * accumulation anywhere except final single-division scores.
  */
object LlmExtras {
  import VecMath._

  /** MinHash(8) + LSH(4 bands × 2 rows) over token 3-gram shingles;
    * candidate pairs sharing any band bucket are verified with exact
    * shingle-set Jaccard >= 0.5.
    *
    * The 8 "permutations" are eight overlapping 8-hex-char windows of
    * ONE md5 per shingle (substr(h, 3i+1, 8), i = 0..7) — the
    * standard cheap-family trick: one hash invocation instead of
    * eight, computed as eight min-aggregates in a single groupBy (no
    * hash-index replication join). The banding is replicated
    * bit-for-bit in the oracle, so the (approximate) recall set is
    * identical across engines. */
  /** Shared DuckDB CTE chain for every minhash-derived oracle
    * (`dedup_minhash_lsh`, `dedup_cluster_cc`'s pair source,
    * `minhash_est_audit`) — one text, zero drift between them. */
  /** The signature-building prefix (tokens → shingles → minhash →
    * shingle sets) shared by [[lshCtes]] AND the band-tuning oracle,
    * which attaches its own banding CTEs to the same signatures. */
  private[ops] val mhCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(3, len(t) + 1),
      |           i -> t[i-2] || ' ' || t[i-1] || ' ' || t[i])) AS shingle
      |  FROM toks),
      |mh AS (
      |  SELECT doc_id,
      |    min(substr(md5(shingle),  1, 8)) AS h0, min(substr(md5(shingle),  4, 8)) AS h1,
      |    min(substr(md5(shingle),  7, 8)) AS h2, min(substr(md5(shingle), 10, 8)) AS h3,
      |    min(substr(md5(shingle), 13, 8)) AS h4, min(substr(md5(shingle), 16, 8)) AS h5,
      |    min(substr(md5(shingle), 19, 8)) AS h6, min(substr(md5(shingle), 22, 8)) AS h7
      |  FROM sh GROUP BY doc_id),
      |sets AS (SELECT doc_id, list(shingle) AS s FROM sh GROUP BY doc_id)""".stripMargin

  private[ops] val lshCtes: String =
    s"""$mhCtes,
      |bands AS (
      |  SELECT doc_id, unnest(range(0, 4)) AS band,
      |    unnest([h0 || '|' || h1, h2 || '|' || h3, h4 || '|' || h5, h6 || '|' || h7]) AS sig
      |  FROM mh),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
      |    AND a.doc_id < b.doc_id)""".stripMargin

  val dedupMinhashLsh: QDef = q(
    "dedup_minhash_lsh",
    s"""WITH $lshCtes
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc
      |FROM cand JOIN sets x ON x.doc_id = doc_a JOIN sets y ON y.doc_id = doc_b
      |WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) >= 0.5
      |ORDER BY doc_a, doc_b""") { (s, d) =>
    minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
  }

  /** Unsorted verified near-dup pairs — the shared pipeline behind the
    * graded `dedup_minhash_lsh` (which adds the presentation sort) and
    * `dedup_cluster_cc` (which consumes the pairs orderless; skipping
    * the sort also skips the range-partitioner's sampling pass, which
    * would run the verify join a second time per materialization). */
  /** Per-doc minhash prep, ONE stateless pass, ONE persisted table
    * (persist, not localCheckpoint — lineage survives executor loss):
    *
    *   - `sl`: the SORTED DISTINCT shingle set as xxhash64 LONGS —
    *     the verify side. Longs, not strings: the merge-walk compares
    *     8-byte values instead of ~20-char UTF8 and the broadcast
    *     payload shrinks ~60%. Intersection/size COUNTS are what feed
    *     the graded output, and those are hash-invariant (the
    *     contamination_ngram precedent; collision odds ~1e-9 at 1e5
    *     distinct shingles — at 1e10+ shingles swap in the 128-bit
    *     hash).
    *   - `h0..h7`: the md5-window minhash signatures, computed PER ROW
    *     over the shingle array (one md5 per shingle via transform,
    *     then eight array_min's). The alternative (explode → md5 →
    *     groupBy with 8 min-aggregates) flows every shingle occurrence
    *     (~100× the doc count) through a full shuffle just to put them
    *     back under their doc_id; here rows never leave their
    *     partition. array_min on strings uses min()'s binary UTF8
    *     ordering, so signatures are identical to the oracle's.
    *
    * The repartition spreads the one-partition fixture scan. */
  private[ops] def shingleBase(s: SparkSession, d: String): DataFrame =
    // r7: the whole prep is the fused one-pass graft_minhash_prep
    // expression — the declarative form ran ~11 interpreted lambda
    // traversals per doc (n-gram transform, xxhash64 transform, md5
    // transform, then 8 array_min(transform(substring)) walks); md5
    // is now computed once per DISTINCT shingle and the windows
    // stream past their minima in the same loop. Same hash values,
    // same signature strings (the expression replicates xxhash64's
    // seed-42 function and substr(md5hex, 3i+1, 8) exactly —
    // ShingleExpressionsSpec pins both against the SQL forms).
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.minhashPrep(col("t"), 3).as("mp"))
      .select(Seq(col("doc_id"), col("mp.sl").as("sl")) ++ (0 until 8).map(i =>
        col("mp.mins").getItem(i).as(s"h$i")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Band buckets → distinct candidate pairs (doc_a < doc_b).
    * Takes the shingleBase table (its h0..h7 columns ARE the
    * signature). */
  private[ops] def bandCandidates(mh: DataFrame): DataFrame = {
    val bands = mh.select(col("doc_id"),
        posexplode(array(
          concat_ws("|", col("h0"), col("h1")), concat_ws("|", col("h2"), col("h3")),
          concat_ws("|", col("h4"), col("h5")), concat_ws("|", col("h6"), col("h7"))))
          .as(Seq("band", "sig")))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact Jaccard for candidate pairs via the codegen'd sorted
    * merge-walk intersection (graft_sorted_intersect_long) —
    * array_intersect/array_union built a hash set per candidate pair;
    * |A∪B| = |A|+|B|−|A∩B| since the arrays are distinct. */
  private[ops] def exactJaccard(cand: DataFrame, base: DataFrame): DataFrame = {
    val inter = graft.functions.VectorFunctions.sortedIntersectLong(col("s_a"), col("s_b"))
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sl").as("s_a")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sl").as("s_b")), "doc_b")
      .withColumn("inter", inter)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (size(col("s_a")) + size(col("s_b")) - col("inter"))).as("jacc"))
  }

  def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val base = shingleBase(s, d)
    exactJaccard(bandCandidates(base), base)
      .filter(col("jacc") >= 0.5)
  }

  /** Sketch-accuracy audit: for every LSH candidate pair, the
    * signature-estimated Jaccard (matching minhash slots / 8) next to
    * the exact shingle-set Jaccard and the absolute error — the
    * quality report a pipeline owner reads before trusting banding
    * parameters at full scale. Estimate and exact are both derived
    * from small-integer divisions, so the doubles (and their
    * difference) are bit-identical across engines. */
  val minhashEstAudit: QDef = q(
    "minhash_est_audit",
    s"""WITH $lshCtes
      |SELECT c.doc_a, c.doc_b,
      |  CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) AS DOUBLE) / 8.0 AS est_jacc,
      |  CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc,
      |  abs(CAST((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h4 = b.h4 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h5 = b.h5 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h6 = b.h6 THEN 1 ELSE 0 END) +
      |       (CASE WHEN a.h7 = b.h7 THEN 1 ELSE 0 END) AS DOUBLE) / 8.0 -
      |    CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |      / len(list_distinct(x.s || y.s))) AS abs_err
      |FROM cand c
      |JOIN mh a ON a.doc_id = c.doc_a JOIN mh b ON b.doc_id = c.doc_b
      |JOIN sets x ON x.doc_id = c.doc_a JOIN sets y ON y.doc_id = c.doc_b
      |ORDER BY doc_a, doc_b""") { (s, d) =>
    val base = shingleBase(s, d)
    val cand = bandCandidates(base)
    val matches = (0 until 8)
      .map(i => (col(s"a.h$i") === col(s"b.h$i")).cast(IntegerType))
      .reduce(_ + _)
    // ONE pair of base joins: the shingle arrays (sl) ride through
    // the same joins that fetch the h-signature columns — re-joining
    // base afterwards just to refetch sl paid two extra join stages
    // per execution (r6 review finding). And est_jacc rides inline:
    // joining exactJaccard's projection back on the pair key would
    // plan a needless SortMergeJoin.
    val est = cand
      .join(base.alias("a"), col("doc_a") === col("a.doc_id"))
      .join(base.alias("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (matches.cast(DoubleType) / 8.0).as("est_jacc"),
        col("a.sl").as("s_a"), col("b.sl").as("s_b"))
    val inter = graft.functions.VectorFunctions.sortedIntersectLong(col("s_a"), col("s_b"))
    est
      .withColumn("inter", inter)
      .withColumn("jacc", col("inter").cast(DoubleType) /
        (size(col("s_a")) + size(col("s_b")) - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("est_jacc"), col("jacc"),
        abs(col("est_jacc") - col("jacc")).as("abs_err"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash per document: md5-derived token hash bits,
    * tf-weighted ±1 votes per bit, sign-threshold — pure integer
    * arithmetic end to end. group_size counts docs sharing a
    * signature (the dedup bucketing use). */
  val dedupSimhash: QDef = q(
    "dedup_simhash",
    """WITH tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |hv AS (
      |  SELECT doc_id, tok, tf,
      |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
      |  FROM tf),
      |votes AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN (h >> j) & 1 = 1 THEN tf ELSE -tf END) AS v
      |  FROM hv CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
      |  GROUP BY doc_id, j),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
      |      AS simhash
      |  FROM votes GROUP BY doc_id)
      |SELECT doc_id, simhash,
      |  COUNT(*) OVER (PARTITION BY simhash) AS group_size
      |FROM sig
      |ORDER BY doc_id""") { (s, d) =>
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val hv = tf.withColumn("h",
      conv(substring(md5(col("tok")), 1, 8), 16, 10).cast(LongType))
    // The oracle spells the 32 bit-votes as a 32x CROSS JOIN row
    // blowup; here each doc folds its (hash, tf) pairs through ONE
    // compiled pass (graft_simhash, SignatureExpressions — r8; the r7
    // form was a nested interpreted `aggregate(sequence(0,31),
    // aggregate(hts, …))` paying 32 × terms lambda evals per doc) —
    // same integer votes (order-free exact sums), zero extra rows,
    // zero extra shuffles. Bit-equality with the SQL fold pinned by
    // SignatureExpressionsSpec.
    val sig = hv.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("h"), col("tf"))).as("hts"))
      .select(col("doc_id"),
        graft.functions.VectorFunctions.simhashSig(col("hts"), 32).as("simhash"))
    sig.select(col("doc_id"), col("simhash"),
        count(lit(1)).over(Window.partitionBy(col("simhash"))).as("group_size"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-space near-dup pairs: cosine >= 0.4, blocked by label
    * (the cluster id plays the LSH-bucket role at scale).
    *
    * Scale formulation (same answer, bench-tuned): the double view
    * and the norm sqrt(v·v) are computed ONCE per vector before the
    * pair join (2k norms instead of 400k), and the 10-value label key
    * is salted by vec_id so pair evaluation spreads across all
    * cores. cos = dot/(norm_a·norm_b) is the identical float tree
    * the oracle evaluates. */
  val dedupNearEmbedding: QDef = q(
    "dedup_near_embedding",
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ${sqlCosine("a.embedding", "b.embedding")} AS sim
      |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE ${sqlCosine("a.embedding", "b.embedding")} >= 0.4
      |ORDER BY vec_a, vec_b""") { (s, d) =>
    val nSalts = 8
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", sqrt(fdot(col("embedding"), col("embedding"))))
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"),
      pmod(col("vec_id"), lit(nSalts)).as("salt"))
    // spread the probe side: one parquet file → one scan partition,
    // and the broadcast join adds no shuffle (same fix as
    // dedup_near_jaccard — without it pair evaluation is single-core)
    val b = e.repartition(s.sparkContext.defaultParallelism).crossJoin(s.range(nSalts).toDF("salt_b"))
      .select(col("vec_id").as("vec_b"), col("label").as("label_b"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b"), col("salt_b"))
    a.join(b, col("salt") === col("salt_b") && col("label") === col("label_b")
        && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(fdot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6).as("sim"))
      .filter(col("sim") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Character-bigram language ID: nearest centroid by integer
    * co-occurrence score normalized by language size (one float
    * division per (doc, lang) — deterministic). Self-trained on the
    * corpus; output keeps the true label for accuracy inspection. */
  val textLangid: QDef = q(
    "text_langid",
    """WITH bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, length(text)),
      |         i -> substr(text, i, 2))) AS b
      |  FROM documents),
      |tfd AS (SELECT doc_id, b, COUNT(*) AS tf FROM bg GROUP BY doc_id, b),
      |clb AS (
      |  SELECT lang, b, SUM(tf) AS c
      |  FROM tfd JOIN documents USING (doc_id)
      |  GROUP BY lang, b),
      |ltot AS (SELECT lang, SUM(c) AS tot FROM clb GROUP BY lang),
      |score AS (
      |  SELECT tfd.doc_id, clb.lang,
      |    CAST(SUM(tfd.tf * clb.c) AS DOUBLE) / max(ltot.tot) AS sc
      |  FROM tfd JOIN clb USING (b) JOIN ltot ON clb.lang = ltot.lang
      |  GROUP BY tfd.doc_id, clb.lang),
      |pred AS (
      |  SELECT doc_id, lang AS pred_lang
      |  FROM score
      |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lang) = 1)
      |SELECT doc_id, documents.lang AS lang, pred_lang,
      |       documents.lang = pred_lang AS correct
      |FROM pred JOIN documents USING (doc_id)
      |ORDER BY doc_id""") { (s, d) =>
    val docs = Tables.documents(s, d)
    // r7: the oracle's per-(doc, b) tf table IS built now — but
    // row-locally, with zero aggregation shuffle: graft_char_bigrams
    // walks the UTF-8 bytes once (O(len), zero-copy slices — the r6
    // fix for the O(len²) substr re-scans), and graft_term_counts
    // hash-counts the bigrams within the row, so the explode emits
    // one row per DISTINCT bigram per doc (~40% of the ~1.5M-row
    // occurrence stream the r6 form shipped through Generate and
    // BOTH downstream consumers). Weighting every consumer by tf
    // keeps the sums over occurrences: SUM(tf) per (lang,b) ==
    // COUNT(*) per (lang,b), and per doc SUM(tf*c) over distinct
    // bigrams == SUM(c) over raw occurrences. Integer sums — exact,
    // hence still hash-identical to the oracle's formulation.
    // repartition before the count pass: the one-file scan is a
    // single partition — without it the bigram build lives on one
    // core. NOT persisted: the build is a stateless codegen map pass
    // and its two consumers recompute it in parallel for less than
    // the columnar cache write costs (measured on the bigger r6
    // occurrence table: persisting added ~1 s one-shot).
    // Same row semantics at the edges: a doc with <2 chars yields an
    // empty bigram array and explode drops it, exactly like the
    // length guard + empty sequence did.
    val bg = docs.repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(graft.functions.VectorFunctions.termCounts(
          graft.functions.VectorFunctions.charBigrams(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("b"), col("tc.tf").as("tf"))
    val clb = bg.join(broadcast(docs.select(col("doc_id"), col("lang"))), "doc_id")
      .groupBy(col("lang"), col("b")).agg(sum(col("tf")).as("c"))
    val ltot = clb.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
    // score via a PIVOTED centroid table: one broadcast join row per
    // doc-bigram with 5 count columns, instead of a 5x row blowup.
    // A lang with no shared bigram scores 0 — it can never win the
    // argmax (the true lang always shares bigrams), so predictions
    // are identical to the oracle's inner-join formulation.
    val langs = Seq("de", "en", "es", "fr", "zh")
    val clbWide = clb.groupBy(col("b"))
      .pivot("lang", langs).agg(first(col("c")))
      .select(col("b") +: langs.map(l => coalesce(col(l), lit(0L)).as(s"c_$l")): _*)
    val summed = bg.join(broadcast(clbWide), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("c_de")).as("s_de"),
        langs.tail.map(l => sum(col("tf") * col(s"c_$l")).as(s"s_$l")): _*)
    // argmax over the five wide score columns, ties to the
    // alphabetically-first lang — exactly the oracle's
    // row_number() OVER (ORDER BY sc DESC, lang) = 1, but with no
    // unpivot, no 25k-row window shuffle, and no per-row ltot join
    // (the 5 language totals ride in as a broadcast 1-row table).
    // sc = exact-int sum / exact-int total: one float division on
    // identical operands per (doc, lang) — deterministic.
    // coalesce-to-1: a lang absent from the corpus would pivot to a
    // NULL total and poison the CASE comparisons; with tot=1 its score
    // is 0/1=0 and can never beat the doc's own lang (score > 0) —
    // same outcome as the oracle's inner join dropping the lang.
    val ltotWide = ltot.groupBy()
      .pivot("lang", langs).agg(first(col("tot")))
      .select(langs.map(l => coalesce(col(l), lit(1L)).as(s"tot_$l")): _*)
    val sc = langs.map(l =>
      (col(s"s_$l").cast(DoubleType) / col(s"tot_$l")).as(s"sc_$l"))
    val scored = summed.crossJoin(broadcast(ltotWide))
      .select(col("doc_id") +: sc: _*)
    val argmax = langs.foldRight(lit(langs.last): Column) { (l, rest) =>
      if (l == langs.last) rest
      else when(langs.filter(_ > l)
        .map(m => col(s"sc_$l") >= col(s"sc_$m"))
        .reduce(_ && _), l).otherwise(rest)
    }
    val pred = scored.select(col("doc_id"), argmax.as("pred_lang"))
    pred.join(broadcast(docs.select(col("doc_id"), col("lang"))), "doc_id")
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        (col("lang") === col("pred_lang")).as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: type-token ratio, stopword ratio, average token
    * length, and a fixed-shape composite score (every ratio is a
    * single int/int division; the composite is the same literal
    * expression tree in both engines). */
  val textQuality: QDef = q(
    "text_quality",
    """WITH f AS (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |    len(list_filter(string_split(text, ' '),
      |        x -> list_contains(['the','a','of','and','in','to'], x))) AS n_stop,
      |    length(text) AS n_char
      |  FROM documents)
      |SELECT doc_id, n_tok, n_uniq, n_stop,
      |  CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
      |  CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
      |  CAST(n_char - (n_tok - 1) AS DOUBLE) / n_tok AS avg_tok_len,
      |  ROUND(0.4 * (CAST(n_uniq AS DOUBLE) / n_tok)
      |      + 0.4 * (1.0 - CAST(n_stop AS DOUBLE) / n_tok)
      |      + 0.2 * least(1.0, CAST(n_tok AS DOUBLE) / 100.0), 6) AS quality
      |FROM f
      |ORDER BY doc_id""") { (s, d) =>
    val t = split(col("text"), " ")
    val stops = array(Seq("the", "a", "of", "and", "in", "to").map(lit): _*)
    val f = Tables.documents(s, d).select(col("doc_id"),
      size(t).as("n_tok"),
      size(array_distinct(t)).as("n_uniq"),
      size(filter(t, x => array_contains(stops, x))).as("n_stop"),
      length(col("text")).as("n_char"))
    val ttr = col("n_uniq").cast(DoubleType) / col("n_tok")
    val stopR = col("n_stop").cast(DoubleType) / col("n_tok")
    f.select(col("doc_id"), col("n_tok"), col("n_uniq"), col("n_stop"),
        ttr.as("ttr"), stopR.as("stop_ratio"),
        ((col("n_char") - (col("n_tok") - 1)).cast(DoubleType) / col("n_tok")).as("avg_tok_len"),
        round(lit(0.4) * ttr + lit(0.4) * (lit(1.0) - stopR)
          + lit(0.2) * least(lit(1.0), col("n_tok").cast(DoubleType) / 100.0), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting two ways: whitespace split vs a BPE-ish regex
    * lexer (letter runs | digit runs | single other-glyphs) — the
    * ratio approximates tokens-per-word for budget estimation. Both
    * engines run the identical POSIX-safe pattern. */
  val textTokenCount: QDef = q(
    "text_token_count",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS bpe_per_word
      |FROM documents
      |ORDER BY doc_id""") { (s, d) =>
    val nWs = size(split(col("text"), " "))
    val nBpe = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    Tables.documents(s, d)
      .select(col("doc_id"), nWs.as("n_ws"), nBpe.as("n_bpe"),
        (nBpe.cast(DoubleType) / nWs).as("bpe_per_word"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: base-31 polynomial rolling hash of the
    * character stream mod 1e9+7 — pure integer fold, identical
    * left-to-right in both engines (DuckDB's first-element seed
    * equals Spark's 0-seed because 0*31 + c1 = c1). */
  val textFingerprint: QDef = q(
    "text_fingerprint",
    """WITH fp AS (
      |  SELECT doc_id,
      |    list_reduce(list_transform(range(1, length(text) + 1),
      |        i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
      |      (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      |  FROM documents)
      |SELECT doc_id, fingerprint,
      |  COUNT(*) OVER (PARTITION BY fingerprint) AS group_size
      |FROM fp
      |ORDER BY doc_id""") { (s, d) =>
    val chars = expr(
      "transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))")
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(chars, lit(0L), (acc, x) => (acc * 31 + x) % 1000000007L).as("fingerprint"))
      .select(col("doc_id"), col("fingerprint"),
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))).as("group_size"))
      .orderBy(col("doc_id"))
  }

  /** IVF-style ANN: route the query (vec_id 0) to the nearest label
    * centroid (exact scaled-integer sums; one division per label),
    * then scan ONLY that partition for cosine top-5 — the pruning
    * pattern that replaces `sim_search_topk`'s full scan at scale. */
  val annIvfLabel: QDef = q(
    "ann_ivf_label",
    s"""WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |cent AS (
      |  SELECT label, i,
      |    SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS s,
      |    COUNT(*) AS n
      |  FROM embeddings CROSS JOIN dims
      |  GROUP BY label, i),
      |qv AS (
      |  SELECT i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qcomp
      |  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) CROSS JOIN dims),
      |score AS (
      |  SELECT label, CAST(SUM(qcomp * s) AS DOUBLE) / max(n) AS sc
      |  FROM cent JOIN qv USING (i) GROUP BY label),
      |best AS (SELECT label FROM score ORDER BY sc DESC, label LIMIT 1)
      |SELECT e.label, e.vec_id,
      |  ${sqlCosine("e.embedding", "q.embedding")} AS sim
      |FROM embeddings e
      |JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q ON true
      |WHERE e.label = (SELECT label FROM best) AND e.vec_id <> 0
      |ORDER BY sim DESC, vec_id
      |LIMIT 5""") { (s, d) =>
    val e = Tables.embeddings(s, d)
    val comp = floor(col("v").cast(DoubleType) * 1000).cast(LongType)
    val exploded = e.select(col("label"), col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
    val cent = exploded
      .groupBy(col("label"), col("i"))
      .agg(sum(comp).as("s"), count(lit(1)).as("n"))
    val qv = exploded.filter(col("vec_id") === 0)
      .select(col("i"), comp.as("qcomp"))
    val best = cent.join(broadcast(qv), "i")
      .groupBy(col("label"))
      .agg((sum(col("qcomp") * col("s")).cast(DoubleType) / max(col("n"))).as("sc"))
      .orderBy(col("sc").desc, col("label"))
      .limit(1)
      .select(col("label").as("best_label"))
    val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    e.join(broadcast(best), col("label") === col("best_label"))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q0))
      .select(col("label"), col("vec_id"),
        fcosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** Random-hyperplane LSH similarity search — the other scale path
    * next to IVF (`ann_ivf_label`): 8 pseudo-hyperplanes with md5-
    * derived ±1 signs per (plane, dim); a vector's bucket is the
    * 8-bit sign pattern of its plane projections (computed on exact
    * scaled integers — no float accumulation), and the query scans
    * ONLY its own bucket for cosine top-5. */
  val simLshBucketed: QDef = q(
    "sim_lsh_bucketed",
    s"""WITH signs AS (
      |  SELECT p, i,
      |    CASE WHEN ('0x' || substr(md5(p || ':' || i), 1, 2))::INT % 2 = 0
      |         THEN 1 ELSE -1 END AS sgn
      |  FROM (SELECT unnest(range(0, 8)) AS p), (SELECT unnest(range(1, 65)) AS i)),
      |proj AS (
      |  SELECT vec_id, p,
      |    SUM(sgn * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS sp
      |  FROM embeddings CROSS JOIN signs
      |  GROUP BY vec_id, p),
      |sig AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN sp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
      |      AS bucket
      |  FROM proj GROUP BY vec_id),
      |qb AS (SELECT bucket FROM sig WHERE vec_id = 0),
      |probes AS (
      |  SELECT unnest(list_transform(range(0, 9),
      |    k -> CASE WHEN k = 0 THEN bucket
      |              ELSE xor(bucket, 1::BIGINT << (k - 1)) END)) AS probe
      |  FROM qb)
      |SELECT s.vec_id, s.bucket,
      |  ${sqlCosine("e.embedding", "q.embedding")} AS sim
      |FROM sig s
      |JOIN probes ON s.bucket = probes.probe
      |JOIN embeddings e ON e.vec_id = s.vec_id
      |JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q ON true
      |WHERE s.vec_id <> 0
      |ORDER BY sim DESC, s.vec_id
      |LIMIT 5""") { (s, d) =>
    val e = Tables.embeddings(s, d)
    // The oracle spells the plane projections as an unnest + two
    // GROUP BYs; here the 8×64 md5-derived ±1 sign matrix is built
    // ONCE as a single 512-element array row (md5 evaluated 512
    // times total, not per vector), broadcast onto every vector, and
    // the whole 8-bit bucket is one nested higher-order expression —
    // identical integer math (sign × exact milli-scaled components,
    // sign threshold, bit-OR), zero shuffles to compute signatures.
    // REQUIRES 64-dim embeddings: zip_with NULL-pads a short/long
    // vector, so the per-dim product is coalesced to 0 (matching the
    // oracle, where DuckDB SUM skips the NULL terms).
    val signsRow = s.range(1).select(expr(
      """transform(sequence(0, 511), k ->
        |  IF(CAST(conv(substring(md5(concat_ws(':', k div 64, k % 64 + 1)), 1, 2), 16, 10) AS INT) % 2 = 0,
        |     CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))""".stripMargin).as("signs"))
    // r8: the bucket fold is one compiled pass per vector
    // (graft_lsh_bucket, SignatureExpressions) — the r7 form was a
    // nested interpreted `aggregate(sequence(0,7),
    // aggregate(zip_with(…)))` paying 8 planes × 64 dims lambda evals
    // per vector (~10M over the sf0.1 embeddings). Identical integer
    // math (sign × exact milli-scaled components, sign threshold,
    // bit-OR), pinned by SignatureExpressionsSpec.
    val bucketExpr = graft.functions.VectorFunctions
      .lshBucket(col("embedding"), col("signs"), 8, 64)
    val withB = e.crossJoin(broadcast(signsRow))
      .select(col("vec_id"), col("embedding"), bucketExpr.as("bucket"))
    // MULTI-PROBE: the query's own bucket plus every Hamming-distance-1
    // bucket — 9 probe values expanded from the 1-row query side, then
    // an EQUALITY join on bucket (the shape that stays a bucket-pruned
    // equi-join at 100 TB, unlike a bit_count(bucket ^ q) predicate
    // which would force a full nested-loop scan). The query embedding
    // rides in the SAME 9-row broadcast, so the plan has one probe-side
    // broadcast instead of a probes broadcast plus a q₀ cross join.
    val probes = withB.filter(col("vec_id") === 0)
      .select(col("bucket").as("q_bucket"), col("embedding").as("q_emb"))
      .select(explode(expr(
        """transform(sequence(0, 8), k ->
          |  IF(k = 0, q_bucket,
          |     q_bucket ^ shiftleft(CAST(1 AS BIGINT), k - 1)))""".stripMargin)).as("probe"),
        col("q_emb"))
    withB.join(broadcast(probes), col("bucket") === col("probe"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket"),
        fcosine(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  /** One k-means iteration over the embeddings (centroids seeded from
    * the true labels, then every vector re-assigned to its nearest
    * centroid): the convergence-step shape of distributed k-means,
    * graded as the per-(label, assigned) confusion counts. All
    * geometry is exact integer math on milli-quantized components —
    * centroid components are floor(sum/n) computed via one double
    * division on identical small-magnitude operands (|sum| ≤ 2e6, so
    * the division is exact-input in both engines), distances are
    * integer sums of squares, argmin ties go to the smaller centroid
    * id. The Spark side pivots the 10 centroids into one broadcast
    * 64-row wide table (the text_langid pattern) — assignment is a
    * single codegen'd map stage, no 10× row blowup, no window. */
  val kmeansAssign: QDef = q(
    "kmeans_assign",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |qv AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc
      |  FROM embeddings CROSS JOIN dims),
      |cent AS (
      |  SELECT label AS cl, i,
      |    CAST(floor(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      |  FROM qv GROUP BY label, i),
      |dist AS (
      |  SELECT qv.vec_id, qv.label, cent.cl,
      |    SUM((qv.qc - cent.c) * (qv.qc - cent.c)) AS d2
      |  FROM qv JOIN cent USING (i)
      |  GROUP BY qv.vec_id, qv.label, cent.cl),
      |asg AS (
      |  SELECT vec_id, label, cl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
      |  FROM dist)
      |SELECT label, CAST(cl AS INT) AS assigned, CAST(COUNT(*) AS BIGINT) AS n
      |FROM asg WHERE rn = 1
      |GROUP BY label, cl
      |ORDER BY label, assigned""") { (s, d) =>
    val labels = 0 to 9
    kmeansAssignments(s, d)
      .groupBy(col("label"), col("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("assigned"))
  }

  /** The milli-quantized (vec_id, label, i, qc) component explode the
    * k-means family shares. Not persisted: every consumer re-runs the
    * posexplode, a pure codegen map over a 2k-row scan — cheaper than
    * writing a 128k-row columnar cache (measured both ways). */
  private[ops] def kmeansEx(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("label"), col("i"),
        floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qc"))

  /** Nearest-centroid assignment over label-seeded centroids — the
    * body of `kmeans_assign`, factored so `kmeans_update_round` runs
    * the IDENTICAL assignment before its Lloyd update step. Returns
    * one row per vector: (vec_id, label, assigned). */
  private def kmeansAssignments(s: SparkSession, d: String): DataFrame = {
    val labels = 0 to 9
    val ex = kmeansEx(s, d)
    val cent = ex.groupBy(col("label"), col("i"))
      .agg(floor(sum(col("qc")).cast(DoubleType) / count(lit(1)))
        .cast(LongType).as("c"))
    val cw = cent.groupBy(col("i"))
      .pivot("label", labels.map(Int.box))
      .agg(first(col("c")))
      .select(col("i") +: labels.map(l => col(l.toString).as(s"c_$l")): _*)
    // coalesce to Long.MaxValue: if a label is absent from a data
    // slice its pivot column is null, and a null distance would
    // null-propagate through the argmin comparisons and silently
    // mis-assign — an unreachable-by-construction centroid must LOSE
    // every comparison instead.
    def distTo(l: Int) = coalesce(
      sum((col("qc") - col(s"c_$l")) * (col("qc") - col(s"c_$l"))),
      lit(Long.MaxValue)).as(s"d_$l")
    val dists = ex.join(broadcast(cw), "i")
      .groupBy(col("vec_id"), col("label"))
      .agg(distTo(0), labels.tail.map(distTo): _*)
    // first (smallest) centroid id that is <= every later one wins:
    // identical to the oracle's ORDER BY d2, cl tie-break.
    val argmin = labels.init.foldRight(lit(labels.last): Column) { (l, rest) =>
      when(labels.filter(_ > l).map(m => col(s"d_$l") <= col(s"d_$m")).reduce(_ && _),
        l).otherwise(rest)
    }
    dists.select(col("vec_id"), col("label"), argmin.as("assigned"))
  }

  /** One full Lloyd update (r12c) — `kmeans_assign` gives the
    * re-assignment; this key grades the step that FOLLOWS it: the new
    * centroid table recomputed from the assigned members (per-cluster
    * per-dimension floor mean over the milli-quantized components)
    * plus the member count. Together the two keys certify a complete
    * distributed k-means iteration. Same exact-integer geometry as
    * the assignment: |per-cluster component sums| ≤ 2e6, so the one
    * float division is exact-input on both engines. The update is a
    * single (cluster, dim)-keyed agg over the component explode —
    * shuffle rows bounded by k×dims partials per map task. */
  val kmeansUpdateRound: QDef = q(
    "kmeans_update_round",
    """WITH dims AS (SELECT unnest(range(1, 65)) AS i),
      |qv AS (
      |  SELECT vec_id, label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qc
      |  FROM embeddings CROSS JOIN dims),
      |cent AS (
      |  SELECT label AS cl, i,
      |    CAST(floor(CAST(SUM(qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
      |  FROM qv GROUP BY label, i),
      |dist AS (
      |  SELECT qv.vec_id, cent.cl,
      |    SUM((qv.qc - cent.c) * (qv.qc - cent.c)) AS d2
      |  FROM qv JOIN cent USING (i)
      |  GROUP BY qv.vec_id, cent.cl),
      |asg AS (
      |  SELECT vec_id, cl,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
      |  FROM dist),
      |members AS (SELECT vec_id, cl FROM asg WHERE rn = 1)
      |SELECT CAST(m.cl AS INT) AS cluster, qv.i,
      |  CAST(floor(CAST(SUM(qv.qc) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c_new,
      |  CAST(COUNT(*) AS BIGINT) AS n_members
      |FROM members m JOIN qv ON qv.vec_id = m.vec_id
      |GROUP BY m.cl, qv.i
      |ORDER BY cluster, i""") { (s, d) =>
    val asg = kmeansAssignments(s, d).select(col("vec_id"), col("assigned"))
    kmeansEx(s, d).join(asg, "vec_id")
      .groupBy(col("assigned").as("cluster"), col("i"))
      .agg(floor(sum(col("qc")).cast(DoubleType) / count(lit(1)))
        .cast(LongType).as("c_new"),
        count(lit(1)).as("n_members"))
      // posexplode is 0-based, the oracle's range(1,65) subscripts are
      // 1-based — emit the 1-based dimension index.
      .select(col("cluster"), (col("i") + 1).cast(IntegerType).as("i"),
        col("c_new"), col("n_members"))
      .orderBy(col("cluster"), col("i"))
  }

  /** Language-ID confusion matrix (r11c) — the EVALUATION step a
    * pipeline runs over its own classifier: `text_langid`'s
    * predictions against the labeled lang, aggregated to (actual,
    * predicted) cells. Reuses the graded langid query wholesale
    * (Spark side calls its run; the oracle embeds its SQL as a CTE —
    * the `graph_degree_stats` composition pattern), so the matrix is
    * certified against the SAME predictions the per-doc key grades.
    * One tiny agg over the per-doc output; cells are bounded by
    * |langs|². */
  val evalLangidConfusion: QDef = q(
    "eval_langid_confusion",
    s"""WITH pred AS (
       |${textLangid.oracle.get}
       |)
       |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       |FROM pred
       |GROUP BY lang, pred_lang
       |ORDER BY lang, pred_lang""") { (s, d) =>
    textLangid.run(s, d)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("correct").cast(LongType)).as("n_correct"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** k-NN holdout classification eval (r12) — the recall/quality
    * check a similarity index ships with: hold out every 50th vector
    * (deterministic id rule), classify each by the majority label of
    * its 5 nearest non-holdout neighbors (fused-cosine similarity,
    * vec_id tie-break; vote ties to the smaller label), and grade
    * the (actual, predicted) confusion matrix. The holdout side is
    * tiny and BROADCAST — candidates stream past it, so the
    * similarity pass is one scan × |holdout| fused cosines with no
    * shuffle; the top-5 window and the vote aggregate both operate
    * on |holdout|×k rows. At 100 TB the brute-force pass swaps for
    * the IVF/LSH routing (`ann_ivf_label`, `sim_lsh_bucketed`)
    * feeding the SAME vote; this exact form is the recall baseline
    * those variants are measured against. */
  val knnHoldoutEval: QDef = q(
    "knn_holdout_eval",
    s"""WITH q AS (
      |  SELECT vec_id AS q_id, label AS actual, embedding AS q_emb
      |  FROM embeddings WHERE vec_id % 50 = 0),
      |cand AS (SELECT vec_id, label, embedding FROM embeddings
      |         WHERE vec_id % 50 <> 0),
      |top AS (
      |  SELECT q_id, actual, cand.label AS c_label
      |  FROM q, cand
      |  QUALIFY row_number() OVER (PARTITION BY q_id
      |    ORDER BY ${sqlCosine("cand.embedding", "q_emb")} DESC, cand.vec_id) <= 5),
      |votes AS (
      |  SELECT q_id, actual, c_label, count(*) AS v
      |  FROM top GROUP BY q_id, actual, c_label),
      |pred AS (
      |  SELECT q_id, actual, c_label AS predicted
      |  FROM votes
      |  QUALIFY row_number() OVER (PARTITION BY q_id
      |    ORDER BY v DESC, c_label) = 1)
      |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
      |FROM pred GROUP BY actual, predicted
      |ORDER BY actual, predicted""") { (s, d) =>
    val e = Tables.embeddings(s, d)
    val qs = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("actual"),
        col("embedding").as("q_emb"))
    val cand = e.filter(col("vec_id") % 50 =!= 0).repartition(s.sparkContext.defaultParallelism)
    val simW = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val top = cand.crossJoin(broadcast(qs))
      .select(col("q_id"), col("actual"), col("label").as("c_label"),
        col("vec_id"), fcosine(col("embedding"), col("q_emb")).as("sim"))
      .withColumn("rn", row_number().over(simW))
      .filter(col("rn") <= 5)
    val voteW = Window.partitionBy(col("q_id"))
      .orderBy(col("v").desc, col("c_label"))
    top.groupBy(col("q_id"), col("actual"), col("c_label"))
      .agg(count(lit(1)).as("v"))
      .withColumn("vr", row_number().over(voteW))
      .filter(col("vr") === 1)
      .groupBy(col("actual"), col("c_label").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** LSH band-parameter tuning report (r12b) — the cost/recall sweep
    * a dedup pipeline runs before committing a banding scheme: the
    * SAME 8 minhash values banded three ways (2×4, 4×2, 8×1), each
    * scheme's candidate volume and exact-verify precision measured.
    * More, narrower bands → recall up, candidates (≙ shuffle + verify
    * cost) up: at sf0.1 the 8×1 scheme yields ~82 k candidates vs
    * 4×2's ~2 k for the same corpus — exactly the number an operator
    * needs before a 100 TB run, where candidates are the dominant
    * cost. One signature build (the persisted shingleBase) feeds all
    * three bandings; per scheme one band-bucket equi-join + the
    * merge-walk verify, counts only — no pair lists shipped. */
  val dedupBandTuning: QDef = q(
    "dedup_band_tuning",
    s"""WITH $mhCtes,
      |bA AS (
      |  SELECT doc_id, unnest(range(0, 4)) AS band,
      |    unnest([h0 || '|' || h1, h2 || '|' || h3, h4 || '|' || h5, h6 || '|' || h7]) AS sig
      |  FROM mh),
      |cA AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bA a JOIN bA b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |bB AS (
      |  SELECT doc_id, unnest(range(0, 2)) AS band,
      |    unnest([h0 || '|' || h1 || '|' || h2 || '|' || h3,
      |            h4 || '|' || h5 || '|' || h6 || '|' || h7]) AS sig
      |  FROM mh),
      |cB AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bB a JOIN bB b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |bC AS (
      |  SELECT doc_id, unnest(range(0, 8)) AS band,
      |    unnest([h0, h1, h2, h3, h4, h5, h6, h7]) AS sig
      |  FROM mh),
      |cC AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bC a JOIN bC b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      |jA AS (SELECT CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc
      |  FROM cA JOIN sets x ON x.doc_id = doc_a JOIN sets y ON y.doc_id = doc_b),
      |jB AS (SELECT CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc
      |  FROM cB JOIN sets x ON x.doc_id = doc_a JOIN sets y ON y.doc_id = doc_b),
      |jC AS (SELECT CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      |    / len(list_distinct(x.s || y.s)) AS jacc
      |  FROM cC JOIN sets x ON x.doc_id = doc_a JOIN sets y ON y.doc_id = doc_b),
      |stats AS (
      |  SELECT 'b2r4' AS scheme, CAST(2 AS BIGINT) AS n_bands,
      |    CAST(4 AS BIGINT) AS rows_per_band,
      |    CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |    CAST(COALESCE(SUM(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |      AS n_verified FROM jB
      |  UNION ALL
      |  SELECT 'b4r2', 4, 2, CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |    FROM jA
      |  UNION ALL
      |  SELECT 'b8r1', 8, 1, CAST(COUNT(*) AS BIGINT),
      |    CAST(COALESCE(SUM(CASE WHEN jacc >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |    FROM jC)
      |SELECT scheme, n_bands, rows_per_band, n_candidates, n_verified,
      |  CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
      |       ELSE CAST(n_verified * 1000000 // n_candidates AS BIGINT) END
      |    AS precision_ppm
      |FROM stats ORDER BY scheme""") { (s, d) =>
    val base = shingleBase(s, d)
    base.count() // materialize before the three banding branches fork
    def cands(sigs: Seq[Column]): DataFrame = {
      val bands = base.select(col("doc_id"),
        posexplode(array(sigs: _*)).as(Seq("band", "sig")))
      val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      val b = bands.select(col("doc_id").as("doc_b"),
        col("band").as("band_b"), col("sig").as("sig_b"))
      a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
    }
    def stats(name: String, nb: Int, rpb: Int, cand: DataFrame): DataFrame =
      exactJaccard(cand, base)
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(when(col("jacc") >= 0.5, 1L).otherwise(0L)), lit(0L))
            .as("n_verified"))
        .select(lit(name).as("scheme"), lit(nb.toLong).as("n_bands"),
          lit(rpb.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_verified"),
          when(col("n_candidates") === 0, 0L)
            .otherwise(expr("n_verified * 1000000L div n_candidates"))
            .as("precision_ppm"))
    val sA = Seq(concat_ws("|", col("h0"), col("h1")),
      concat_ws("|", col("h2"), col("h3")), concat_ws("|", col("h4"), col("h5")),
      concat_ws("|", col("h6"), col("h7")))
    val sB = Seq(concat_ws("|", col("h0"), col("h1"), col("h2"), col("h3")),
      concat_ws("|", col("h4"), col("h5"), col("h6"), col("h7")))
    val sC = (0 until 8).map(i => col(s"h$i"))
    stats("b2r4", 2, 4, cands(sB))
      .union(stats("b4r2", 4, 2, cands(sA)))
      .union(stats("b8r1", 8, 1, cands(sC)))
      .orderBy(col("scheme"))
  }

  /** ANN recall audit (r12d): recall@5 of the hyperplane-LSH bucket
    * probe (`sim_lsh_bucketed`'s 8-plane signature + Hamming-1
    * multi-probe) against the brute-force exact top-5, per query
    * vector over an 8-query eval panel. THE number an ANN rollout at
    * 100 TB is gated on: the candidate generation is the same
    * bucket-equality join that prunes at scale, while the exact side
    * is O(N·|panel|) — bounded by the fixed eval panel, never run
    * corpus×corpus. Per query: candidate-set size, hits among the
    * exact top-5, and recall in percent (n_hits·20 — exact integers
    * end to end; cosine ties broken by vec_id in both engines). */
  val evalAnnRecall: QDef = q(
    "eval_ann_recall",
    s"""WITH signs AS (
      |  SELECT p, i,
      |    CASE WHEN ('0x' || substr(md5(p || ':' || i), 1, 2))::INT % 2 = 0
      |         THEN 1 ELSE -1 END AS sgn
      |  FROM (SELECT unnest(range(0, 8)) AS p), (SELECT unnest(range(1, 65)) AS i)),
      |proj AS (
      |  SELECT vec_id, p,
      |    SUM(sgn * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS sp
      |  FROM embeddings CROSS JOIN signs
      |  GROUP BY vec_id, p),
      |sig AS (
      |  SELECT vec_id,
      |    CAST(SUM(CASE WHEN sp > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT)
      |      AS bucket
      |  FROM proj GROUP BY vec_id),
      |qs AS (SELECT vec_id AS q_id, bucket AS q_bucket FROM sig WHERE vec_id < 8),
      |probes AS (
      |  SELECT q_id, unnest(list_transform(range(0, 9),
      |    k -> CASE WHEN k = 0 THEN q_bucket
      |              ELSE xor(q_bucket, 1::BIGINT << (k - 1)) END)) AS probe
      |  FROM qs),
      |cand AS (
      |  SELECT DISTINCT p.q_id, s.vec_id
      |  FROM probes p JOIN sig s ON s.bucket = p.probe
      |  WHERE s.vec_id <> p.q_id),
      |sims AS (
      |  SELECT qe.vec_id AS q_id, e.vec_id,
      |    ${sqlCosine("e.embedding", "qe.embedding")} AS sim
      |  FROM embeddings e JOIN embeddings qe
      |    ON qe.vec_id < 8 AND e.vec_id <> qe.vec_id),
      |topk AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id,
      |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
      |    FROM sims) WHERE rn <= 5),
      |hits AS (
      |  SELECT t.q_id, CAST(COUNT(c.vec_id) AS BIGINT) AS n_hits
      |  FROM topk t LEFT JOIN cand c ON c.q_id = t.q_id AND c.vec_id = t.vec_id
      |  GROUP BY t.q_id),
      |nc AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand GROUP BY q_id)
      |SELECT h.q_id, CAST(COALESCE(nc.n_cand, 0) AS BIGINT) AS n_cand,
      |  h.n_hits, CAST(h.n_hits * 20 AS BIGINT) AS recall_pct
      |FROM hits h LEFT JOIN nc ON nc.q_id = h.q_id
      |ORDER BY h.q_id""") { (s, d) =>
    val e = Tables.embeddings(s, d)
    // Signature construction is sim_lsh_bucketed's, verbatim: one
    // 512-element md5-derived ±1 sign row broadcast onto every vector,
    // bucket folded by the compiled graft_lsh_bucket pass.
    val signsRow = s.range(1).select(expr(
      """transform(sequence(0, 511), k ->
        |  IF(CAST(conv(substring(md5(concat_ws(':', k div 64, k % 64 + 1)), 1, 2), 16, 10) AS INT) % 2 = 0,
        |     CAST(1 AS BIGINT), CAST(-1 AS BIGINT)))""".stripMargin).as("signs"))
    val withB = e.crossJoin(broadcast(signsRow))
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions
          .lshBucket(col("embedding"), col("signs"), 8, 64).as("bucket"))
    val qs = withB.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    val probes = qs.select(col("q_id"), explode(expr(
      """transform(sequence(0, 8), k ->
        |  IF(k = 0, q_bucket,
        |     q_bucket ^ shiftleft(CAST(1 AS BIGINT), k - 1)))""".stripMargin))
      .as("probe"))
    val cand = withB.select(col("vec_id"), col("bucket"))
      .join(broadcast(probes), col("bucket") === col("probe"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val sims = e.crossJoin(broadcast(qs.select(col("q_id"), col("q_emb"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        fcosine(col("embedding"), col("q_emb")).as("sim"))
    val topk = sims.withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rn") <= 5).select(col("q_id"), col("vec_id"))
    val hits = topk
      .join(cand.select(col("q_id").as("c_q"), col("vec_id").as("c_vec")),
        col("c_q") === col("q_id") && col("c_vec") === col("vec_id"), "left")
      .groupBy(col("q_id")).agg(count(col("c_vec")).as("n_hits"))
    val nc = cand.groupBy(col("q_id")).agg(count(lit(1)).as("n_cand"))
    hits.join(nc.select(col("q_id").as("nq"), col("n_cand")),
        col("nq") === col("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        col("n_hits"), (col("n_hits") * 20).cast(LongType).as("recall_pct"))
      .orderBy(col("q_id"))
  }

  /** Product-quantization codes (r12m) — the memory-compression leg
    * of the ANN family (Jégou et al. 2011): the 64-dim embedding
    * splits into 4×16-dim subspaces, each sub-vector snaps to the
    * nearest of 8 sub-centroids, and a vector is stored as 4 bytes
    * of codes instead of 256 bytes of floats. The codebook here is
    * SEED-derived (sub-vectors of vec_id 0..7 — deterministic, no
    * training loop: `kmeans_update_round` owns Lloyd updates; this
    * key grades the assign/compress machinery). Numeric ladder is
    * the k-means family's: milli-quantized components, exact BIGINT
    * squared distances, argmin ties to the smallest code via
    * min(struct(d2, code)) ≡ the oracle's ORDER BY d2, code. Graded
    * per (subspace, code): population + total residual — the
    * codebook-balance/distortion table a PQ index tuner reads.
    * Scale posture: the 32-row codebook broadcasts onto the
    * component explode; one (vec, subspace, code) distance agg, one
    * argmin agg, one ≤32-group fold. */
  val simPqCodes: QDef = q(
    "sim_pq_codes",
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
      |asg AS (
      |  SELECT vec_id, s, code, d2,
      |    row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn
      |  FROM dist)
      |SELECT s AS subspace, code, CAST(COUNT(*) AS BIGINT) AS n_assigned,
      |  CAST(SUM(d2) AS BIGINT) AS sum_d2
      |FROM asg WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""") { (s, d) =>
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        floor(col("v").cast(DoubleType) * 1000).cast(LongType).as("qc"),
        expr("CAST(i div 16 AS INT)").as("s"))
    val cb = ex.filter(col("vec_id") < 8)
      .select(col("i").as("ci"), col("vec_id").cast(IntegerType).as("code"),
        col("qc").as("sc"))
    val dist = ex.join(broadcast(cb), col("ci") === col("i"))
      .groupBy(col("vec_id"), col("s"), col("code"))
      .agg(sum((col("qc") - col("sc")) * (col("qc") - col("sc"))).as("d2"))
    val asg = dist.groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("code"))).as("m"))
    asg.groupBy(col("s").as("subspace"), col("m.code").as("code"))
      .agg(count(lit(1)).as("n_assigned"), sum(col("m.d2")).as("sum_d2"))
      .orderBy(col("subspace"), col("code"))
  }

  /** Gains / cumulative-capture chart (r12s) — THE ranking-model
    * evaluation table: score every user by their PRE-period spend
    * (first 15 days — the same deterministic score CUPED covaries
    * on), cut into score deciles from the top, and report how much
    * of the POST-period outcome mass each decile captures. A good
    * score front-loads the capture; the diagonal is a random ranker.
    * EXACT DISTRIBUTED RANKS: per-user rank = exclusive prefix over
    * distinct score values (the shared bucketed two-pass primitive)
    * + row_number within the tie group (by user_id — a total order),
    * so decile membership is partitioning- and engine-independent;
    * decile = (n − rank)·10 div n. Cumulative capture comes from a
    * broadcast ≤10-row triangular self-join, never an unpartitioned
    * window. Everything is BIGINT until the floor-ppm edges. */
  val evalGainsCapture: QDef = q(
    "eval_gains_capture",
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
      |        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) < 15
      |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN date_diff('day', DATE '2024-01-01',
      |        CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) >= 15
      |      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(y) AS BIGINT) AS y_total FROM u),
      |rk AS (
      |  SELECT user_id, y,
      |    CAST(ROW_NUMBER() OVER (ORDER BY x, user_id) AS BIGINT) AS rank
      |  FROM u),
      |dec AS (
      |  SELECT CAST(((n - rank) * 10) // n AS BIGINT) AS decile, y
      |  FROM rk CROSS JOIN n),
      |g AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(y) AS BIGINT) AS y_cents
      |  FROM dec GROUP BY 1),
      |c AS (
      |  SELECT a.decile, a.n_users, a.y_cents,
      |    CAST(SUM(b.y_cents) AS BIGINT) AS cum_cents
      |  FROM g a JOIN g b ON b.decile <= a.decile
      |  GROUP BY 1, 2, 3)
      |SELECT c.decile, c.n_users, c.y_cents,
      |  CAST(c.y_cents * 1000000 // n.y_total AS BIGINT) AS capture_ppm,
      |  CAST(c.cum_cents * 1000000 // n.y_total AS BIGINT)
      |    AS cum_capture_ppm
      |FROM c CROSS JOIN n ORDER BY c.decile""") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val dayNo = datediff(date_trunc("day", col("ts")).cast(DateType),
      lit("2024-01-01").cast(DateType))
    val cents = (col("value").cast(DecimalType(12, 2)) * 100)
      .cast(LongType)
    val u = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(sum(when(dayNo < 15, cents).otherwise(0L)).as("x"),
        sum(when(dayNo >= 15, cents).otherwise(0L)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = u.agg(count(lit(1)).as("n"), sum(col("y")).as("y_total"))
    // exact distributed rank: exclusive prefix over distinct scores +
    // row_number within the tie group (never a global window)
    val xc = u.groupBy(col("x").as("v")).agg(count(lit(1)).as("cnt"))
    val pre = DriftOps.exclusivePrefix(xc, expr("v div 100000"))
      .select(col("v"), col("pre"))
    val wTie = Window.partitionBy(col("x")).orderBy(col("user_id"))
    val rk = u.join(pre, col("v") === col("x"))
      .select(col("user_id"), col("y"),
        (col("pre") + row_number().over(wTie)).as("rank"))
    val g = rk.crossJoin(broadcast(n))
      .select(expr("CAST(((n - rank) * 10) div n AS BIGINT)").as("decile"),
        col("y"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("y_cents"))
    val c = g.join(broadcast(g.select(col("decile").as("bd"),
        col("y_cents").as("by"))), col("bd") <= col("decile"))
      .groupBy(col("decile"), col("n_users"), col("y_cents"))
      .agg(sum(col("by")).as("cum_cents"))
    c.crossJoin(broadcast(n))
      .select(col("decile"), col("n_users"), col("y_cents"),
        expr("CAST(y_cents * 1000000 div y_total AS BIGINT)")
          .as("capture_ppm"),
        expr("CAST(cum_cents * 1000000 div y_total AS BIGINT)")
          .as("cum_capture_ppm"))
      .orderBy(col("decile"))
  }

  val all: Seq[QDef] = Seq(
    dedupMinhashLsh, minhashEstAudit, dedupSimhash, dedupNearEmbedding,
    textLangid, textQuality, textTokenCount, textFingerprint,
    annIvfLabel, simLshBucketed, kmeansAssign, evalLangidConfusion,
    knnHoldoutEval, dedupBandTuning, kmeansUpdateRound, evalAnnRecall,
    simPqCodes, evalGainsCapture)
}
