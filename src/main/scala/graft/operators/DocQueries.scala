package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.core.PortableHash

/** Training-data pipeline operators over the `documents` table: exact and
  * near-duplicate detection (minhash-LSH, simhash, n-gram Jaccard), language
  * ID, quality scoring, token counting and set fingerprinting. Every
  * operator has an exact-integer formulation so the DuckDB oracle matches
  * bit-for-bit (no float comparisons anywhere).
  */
object DocQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Tokenization shared by both engines: maximal non-space runs. */
  private val wordsExpr = "regexp_extract_all(text, '\\\\S+', 0)"
  private val duckWords = "regexp_extract_all(text, '\\S+')"

  private def h60word(col: String) = // word hash bounded to < 2^30 for overflow-free minhash
    s"(${PortableHash.sparkSql(col)} % 1000000007)"
  private def duckH60word(col: String) =
    s"(${PortableHash.duckSql(col)} % 1000000007)"

  /** distinct (doc_id, word) pairs. */
  private def docWords(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(expr(wordsExpr)).as("word"))
      .distinct()

  private val duckDocWords =
    s"(SELECT DISTINCT doc_id, unnest($duckWords) AS word FROM documents)"

  /** 32 minhash functions in 2 bands x 16 rows: the banding threshold
    * (1/b)^(1/r) = 0.5^(1/16) ~ 0.96 targets true near-duplicates. The
    * synthetic corpus is mutually VERY similar (measured mean pair-Jaccard
    * 0.61, 7% of pairs >= 0.9), so shallow bands (round 1 used 4x2, which
    * admitted 79% of all pairs) degenerate to all-pairs on this data —
    * steep 16-row bands keep the candidate set near the true-positive set
    * while identical documents (planted dups) still collide in every band.
    */
  private val MinhashSeeds: Seq[(Long, Long)] =
    (0 until 32).map(j => (2L * j + 3, 12345L + 777L * j))
  private val BandRows = 16
  private val P = 1000000007L

  /** Band buckets holding more docs than this are skipped for candidate
    * generation (and counted): one degenerate all-identical bucket is
    * quadratic within the bucket — the band-join analogue of the word DF
    * cap. 256 is well above the sf0.01 gate-scale maximum (104). */
  val LshBucketCap = 256

  /** Keep only rows whose `bucketCol` group size is <= cap (mirrored in the
    * DuckDB oracle as GROUP BY ... HAVING COUNT(*) <= cap). */
  private[operators] def cappedBuckets(bands: DataFrame, bucketCol: String, cap: Int): DataFrame = {
    val ok = bands.groupBy(bucketCol).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= cap).select(bucketCol)
    bands.join(ok, Seq(bucketCol), "left_semi")
  }

  /** Per-doc word sets and the minhash band-bucket assignment shared by
    * the d_minhash_lsh query and the bucket diagnostics. */
  private def minhashWordsAndBands(s: SparkSession, dir: String,
                                   pin: Boolean = false): (DataFrame, DataFrame) = {
    val d = docs(s, dir).select("doc_id", "text")
    val planted = d.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 20000000L)
    wordsAndBands(d.unionByName(planted), pin)
  }

  /** The per-row minhash kernel instance (32 hashes, 2 bands x 16 rows). */
  private[graft] lazy val mhKernel = new graft.plans.MinhashBandsKernel(
    MinhashSeeds.map(_._1).toArray, MinhashSeeds.map(_._2).toArray, P, BandRows)

  /** Per-doc distinct word ARRAYS (doc_id, n, words) and the minhash band
    * buckets (doc_id, n, bucket) for any (doc_id, text) frame — the
    * minhash core, reused by the incremental batch-vs-corpus dedup.
    *
    * Round-6 shape: BOTH frames are pure per-row column maps — zero
    * exchanges. The band buckets come from the native MinhashBands kernel
    * over the raw word multiset (min over the multiset == min over the
    * distinct set, so the buckets are bit-identical to the former
    * explode + DISTINCT + md5 + 32-min-groupBy formulation, which paid
    * two full exchanges of every word pair — and paid them once per
    * subplan reference, up to 4x, because most references sit inside
    * broadcast builds that runtime exchange reuse cannot serve). n is the
    * distinct word count (the Jaccard denominators) and `words` the
    * distinct word array (the intersection input), both per-row
    * array ops. Docs with zero words are excluded exactly as the old
    * signature aggregation excluded them (no word rows -> no sig row).
    *
    * pin = true additionally pins both frames for callers that reference
    * them from many subplans AND are benched construction+execution
    * together (d_dup_groups); d_minhash_lsh stays fully in-plan so the
    * headline bench keeps timing the whole pipeline per action.
    */
  private def wordsAndBands(docsFrame: DataFrame, pin: Boolean = false): (DataFrame, DataFrame) = {
    def maybePin(df: DataFrame): DataFrame = if (pin) df.localCheckpoint() else df
    // spread a narrow input first: documents.parquet is one split and the
    // per-row shape has NO downstream exchange to redistribute the work,
    // so without this every tokenize+kernel map would run in one task (the
    // old explode+DISTINCT shape parallelized as a side effect of its
    // first shuffle). A wide input at scale keeps its own partitioning.
    val para = docsFrame.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docsFrame.rdd.getNumPartitions < para) docsFrame.repartition(para)
      else docsFrame
    // the zero-word guard is an rlike on the RAW text, not size(ws) > 0:
    // a size() filter over the derived column gets pushed below the
    // projection and re-evaluates the full regexp_extract_all per row in
    // the Filter (observed in the executed plan); `text RLIKE '\S'` is the
    // same predicate (>= 1 maximal non-space run exists iff any non-space
    // char exists) as a first-match scan that pushes to the source scan
    val withWs = spread
      .filter(col("text").rlike("\\S"))
      .withColumn("ws", expr(wordsExpr))
      .withColumn("words", array_distinct(col("ws")))
      .withColumn("n", size(col("words")).cast("long"))
    val wsets = maybePin(withWs.select(col("doc_id"), col("n"), col("words")))
    val bands = maybePin(withWs.select(col("doc_id"), col("n"),
      explode(graft.plans.MinhashBands(col("ws"), mhKernel)).as("bucket")))
    (wsets, bands)
  }

  /** Confirmed near-dup pairs (a < b, J >= 0.9) — the shared core of
    * d_minhash_lsh and the connected-components grouping d_dup_groups.
    * Columns: a, b, i, na, nb.
    */
  private def minhashConfirmedPairs(s: SparkSession, dir: String,
                                    pin: Boolean = false): DataFrame = {
    val (wsets, bands) = minhashWordsAndBands(s, dir, pin)
    // hot-bucket cap as a count-over-bucket WINDOW instead of the
    // aggregate + broadcast-semi-join pair: the self-join below needs the
    // band rows partitioned (and, for a sort-merge, sorted) by bucket
    // anyway, so the window's exchange is the join's exchange — both
    // sides of the self-join reference the identical subtree and reuse
    // ONE shuffle stage, where the semi-join shape paid an extra
    // aggregation exchange plus a broadcast build per side. Same rows
    // kept (group size <= cap), oracle unchanged.
    val wCap = org.apache.spark.sql.expressions.Window.partitionBy("bucket")
    val bc = bands.withColumn("bn", count(lit(1)).over(wCap))
      .filter(col("bn") <= LshBucketCap).drop("bn")
    // na/nb ride the candidate rows (computed in the per-row band map) —
    // no separate size frame, no extra joins
    val cand = bc.as("x").join(bc.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    // exact-Jaccard confirm on the per-doc distinct word ARRAYS:
    // i = |intersection| via array_intersect per candidate pair — two
    // equi-joins on the doc id attach the arrays; the former formulation
    // re-joined every exploded (doc_id, word) row on (doc, word), a
    // shuffle of the whole word multiset per side. A pair with no common
    // words yields i = 0, which the J >= 0.9 filter drops exactly as the
    // former inner word-join dropped it (na, nb >= 1 by construction).
    val inter = cand
      .join(wsets.select(col("doc_id").as("a"), col("words").as("wa")), Seq("a"))
      .join(wsets.select(col("doc_id").as("b"), col("words").as("wb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("i"),
        col("na"), col("nb"))
    inter
      .filter(lit(19) * col("i") >= lit(9) * (col("na") + col("nb")))
      .select("a", "b", "i", "na", "nb")
  }

  /** Transitive-closure CTE block over the confirmed pairs (appended after
    * [[minhashOracleCtes]]; shared by the d_dup_groups / d_dup_reps
    * oracles) — an algorithm-independent fixpoint vs the engine's HashMin. */
  private def dupCompCtes: String =
    """conf AS (SELECT a, b
      |         FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
      |         WHERE 19 * i >= 9 * (sa.n + sb.n)),
      |e AS (SELECT a AS s, b AS d FROM conf UNION SELECT b, a FROM conf),
      |nn AS (SELECT DISTINCT s AS id FROM e),
      |reach AS (SELECT id, id AS r FROM nn
      |          UNION
      |          SELECT e.d AS id, reach.r FROM reach JOIN e ON e.s = reach.id),
      |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin

  /** HashMin connected-component labels (id -> min id of its component)
    * over the confirmed near-dup pair graph — the shared core of
    * d_dup_groups and d_dup_reps. See the loop comments for the one-job
    * rounds, the scale-adaptive broadcast and the fused init.
    */
  /** See [[graft.core.Caching.freeLocalCheckpoints]] — without this the
    * HashMin loop accumulates one persisted frame per round until GC. */
  private def freeLocalCheckpoint(df: DataFrame): Unit =
    graft.core.Caching.freeLocalCheckpoints(df)

  /** Below this edge count the connected-components labeling runs as a
    * SINGLE-TASK union-find instead of the iterative HashMin loop — the
    * same scale-adaptive reasoning as a broadcast join: when the whole
    * graph fits one executor's memory (2M edges ~ 32 MB of longs), paying
    * 8-11 distributed rounds of job overhead to propagate labels is pure
    * waste. Above the cap the shuffle-native loop below is the only shape
    * that holds. CcSpec asserts both branches produce identical labels. */
  val LocalCcEdgeCap: Long = 1L << 21

  private[graft] def dupLabels(s: SparkSession, dir: String,
                               localCap: Long = LocalCcEdgeCap): DataFrame = {
    // pin = true: the edge frame is re-derived and checkpointed anyway,
    // and the pair pipeline's word/band frames are referenced from many
    // subplans — pinning them keeps construction to one pass each (this
    // caller's bench entry times construction + execution together)
    val pairs = minhashConfirmedPairs(s, dir, pin = true).select("a", "b")
    // both edge directions from ONE pass: the former
    // `pairs.select(a,b) union pairs.select(b,a)` re-executed the entire
    // minhash pair pipeline (bands, candidate join, Jaccard confirm —
    // the ~2.7 s dominant cost of this operator) once per union branch;
    // the explode emits src->dst and dst->src per input row in a single
    // execution, and the checkpoint (in ccLabels) pins the result
    val edges = pairs
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val out = ccLabels(s, edges, localCap)
    // ccLabels materialized the edge frame, so the pair pipeline's pinned
    // word/band frames (unreachable from the returned labels) go now
    graft.core.Caching.freeLocalCheckpoints(pairs)
    out
  }

  /** Connected-component labels (id -> min id of its component) over a
    * bidirectional (src, dst) edge frame. Scale-adaptive: single-task
    * union-find under `localCap` edges, distributed HashMin + pointer-jump
    * above it.
    *
    * CALLER-MUST-FREE contract: the returned frame is pinned by a
    * localCheckpoint (as are dupLabels' word/band pins until it frees
    * them). Callers that loop — the bench does, via
    * Caching.freeLocalCheckpoints on the consumed frame — must release
    * it; a one-shot caller (Verify's per-query dump) leaks one small
    * labeled frame per invocation until GC + ContextCleaner reclaim it,
    * which is bounded and acceptable there. */
  private[graft] def ccLabels(s: SparkSession, edges0: DataFrame, localCap: Long): DataFrame = {
    import s.implicits._
    val edges = edges0.localCheckpoint()
    val nEdges = edges.count()
    if (nEdges <= localCap) {
      // one executor task, classic union-find with path compression and
      // min-root union — labels = component minima by construction.
      // Eagerly checkpointed so the edges pin can be released NOW (not at
      // GC + ContextCleaner time): callers that loop (the bench) would
      // otherwise accumulate one pinned edge frame per invocation.
      val out = edges.as[(Long, Long)].repartition(1).mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) x = parent(x)
          var y = x0
          while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
          x
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val ks = parent.keys.toArray
        ks.iterator.map(k => (k, find(k)))
      }.toDF("id", "lab").localCheckpoint()
      freeLocalCheckpoint(edges)
      return out
    }
    // init = HashMin round 1 fused in: label0 = min(id, min neighbour) —
    // same shuffle cost as a bare distinct over the endpoints, one fewer
    // convergence round (edges are bidirectional, so grouping by src
    // covers every participating node)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("lab"))
      .localCheckpoint()
    // scale-adaptive join side: the label frame has one row per
    // PARTICIPATING node. Below the threshold broadcast it so the edge
    // list streams map-side every round (no per-round edge shuffle);
    // above it fall back to the shuffle equi-join — the only shape that
    // holds when the node set itself is beyond one executor's memory.
    // (Explicit, because checkpointed frames carry no size stats for the
    // planner's own auto-broadcast to act on.)
    val nNodes = labels.count()
    def joinSide(l: DataFrame) = if (nNodes <= 500000) broadcast(l) else l
    var changed = 1L
    while (changed > 0) {
      // ONE job per round: the propagation join carries each node's own
      // previous label through the min-aggregate (own=true rows), and an
      // accumulator counts decreases while the eager localCheckpoint
      // materializes — the former separate join-back + count() job per
      // round is folded away. (Every dst id is also a seeded label id,
      // so `old` is never null.)
      //
      // POINTER JUMP fused into the same job: after the one-hop min
      // (lab1), each node also takes the PREVIOUS round's label of lab1
      // (m(lab1) <= lab1, same component — labels are monotone and every
      // label value is itself a participating node id). One-hop alone
      // needs diameter rounds (11 on the sf0.1 pair graph's chain-shaped
      // components); hop+jump roughly doubles the propagated distance per
      // round, converging in ~log2(diameter) rounds. The second join is
      // against the same broadcast frame the propagation join uses, so
      // the exchange is reused, not rebuilt.
      val acc = s.sparkContext.longAccumulator("cc-changed")
      val prop = edges.join(joinSide(labels.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id"), col("lab"), lit(false).as("own"))
      val next = labels.select(col("id"), col("lab"), lit(true).as("own"))
        .union(prop)
        .groupBy("id")
        .agg(min("lab").as("lab1"), min(when(col("own"), col("lab"))).as("old"))
        .join(joinSide(labels.select(col("id").as("lab1"), col("lab").as("lab2"))),
          Seq("lab1"), "left")
        .select(col("id"),
          least(col("lab1"), coalesce(col("lab2"), col("lab1"))).as("lab"), col("old"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, lab, old) =>
            if (lab < old) acc.add(1L)
            (id, lab)
          }
        }
        .toDF("id", "lab")
        .localCheckpoint()
      changed = acc.value
      // the new round's labels are materialized (eager checkpoint), so the
      // previous round's storage can go now — not at GC time
      freeLocalCheckpoint(labels)
      labels = next
      // accumulator note: a retried task can over-count decreases (one
      // spurious extra round — benign); a zero-change round counts exactly
      // zero regardless of retries, so termination stays deterministic
    }
    // final labels are materialized; the edges pin can go now (the caller
    // can release the returned frame itself via freeLocalCheckpoints)
    freeLocalCheckpoint(edges)
    labels
  }

  /** The minhash-LSH oracle pipeline as a CTE list ending in `inter` + `sz`
    * (shared verbatim by the d_minhash_lsh and d_dup_groups oracles). */
  /** Suffix-parameterized minhash signature/band CTEs (w$sfx, h$sfx,
    * sig$sfx, b$sfx) over any (doc_id, text) source CTE — the oracle twin
    * of [[wordsAndBands]]. */
  private def minhashSigCtes(srcCte: String, sfx: String): String = {
    val mins = MinhashSeeds.zipWithIndex.map { case ((a, b), j) =>
      s"MIN(($a * hw + $b) % $P) AS m$j" }.mkString(", ")
    val bands = (0 until MinhashSeeds.length / BandRows).map { bd =>
      val cols = (0 until BandRows).map(r => s"m${BandRows * bd + r}").mkString(" || ':' || ")
      s"SELECT doc_id, '$bd:' || $cols AS bucket FROM sig$sfx"
    }.mkString(" UNION ALL ")
    s"""w$sfx AS (SELECT DISTINCT doc_id, unnest($duckWords) AS word FROM $srcCte),
       |h$sfx AS (SELECT doc_id, ${duckH60word("word")} AS hw FROM w$sfx),
       |sig$sfx AS (SELECT doc_id, $mins FROM h$sfx GROUP BY doc_id),
       |b$sfx AS ($bands)""".stripMargin
  }

  private def minhashOracleCtes: String = {
    s"""all_docs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 20000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
       |${minhashSigCtes("all_docs", "")},
       |okb AS (SELECT bucket FROM b GROUP BY bucket HAVING COUNT(*) <= $LshBucketCap),
       |bc AS (SELECT b.doc_id, b.bucket FROM b JOIN okb USING (bucket)),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |         FROM bc x JOIN bc y ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY doc_id),
       |inter AS (SELECT c.a, c.b, COUNT(*) AS i
       |          FROM cand c JOIN w x ON x.doc_id = c.a
       |                      JOIN w y ON y.doc_id = c.b AND y.word = x.word
       |          GROUP BY c.a, c.b)""".stripMargin
  }

  /** Diagnostic: (largest band-bucket size, buckets dropped by the cap). */
  def minhashBucketStats(s: SparkSession, dir: String): (Long, Long) = {
    val sizes = minhashWordsAndBands(s, dir)._2
      .groupBy("bucket").agg(count(lit(1)).as("bn"))
    val agg = sizes.agg(max("bn").as("mx"),
      sum(when(col("bn") > LshBucketCap, 1L).otherwise(0L)).as("dropped")).head()
    (agg.getLong(0), agg.getLong(1))
  }

  /** Static corpus index for the incremental screen: the capped band index
    * and the per-doc distinct word sets — the build side of the
    * stream-static join (at scale: the precomputed on-disk index). */
  def corpusBandIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = docs(s, dir).select("doc_id", "text")
    val (wsets, b) = wordsAndBands(base)
    (cappedBuckets(b, "bucket", LshBucketCap),
      wsets.select(col("doc_id"), col("words").as("ows")))
  }

  /** The stream-side incremental screen over a (doc_id, text) batch frame:
    * per-row signature (the native MinhashBands kernel — no shuffle),
    * band explode, stream-static equi-join against the corpus index,
    * exact-Jaccard confirm on the carried word sets — every step
    * stateless, so the ONE allowed streaming aggregation is the final
    * per-doc match summary (collect_set stands in for the distinct
    * aggregate streaming disallows). */
  def incrScreen(batch: DataFrame, bandIdx: DataFrame, wordSets: DataFrame): DataFrame = {
    val cand = batch
      .withColumn("nws", array_distinct(expr(wordsExpr)))
      .withColumn("bucket",
        explode(graft.plans.MinhashBands(expr(wordsExpr), mhKernel)))
      .select(col("doc_id").as("new_id"), col("nws"), col("bucket"))
      .join(bandIdx, Seq("bucket"))
      .select(col("new_id"), col("nws"), col("doc_id").as("oid"))
      .join(wordSets.select(col("doc_id").as("oid"), col("ows")), Seq("oid"))
    cand
      .filter(lit(19) * size(array_intersect(col("nws"), col("ows"))) >=
        lit(9) * (size(col("nws")) + size(col("ows"))))
      .groupBy("new_id").agg(collect_set("oid").as("matches"))
      .select(col("new_id"),
        size(col("matches")).cast("long").as("n_matches"),
        array_min(col("matches")).as("keeper"))
  }

  /** Oracle-side twin of the incremental screen for a given batch CTE —
    * shared by d_incr_dedup-style gates and the streaming variant. */
  private[graft] def incrScreenOracleSql(newdCte: String): String =
    s"""WITH newd AS ($newdCte),
       |${minhashSigCtes("documents", "o")},
       |${minhashSigCtes("newd", "n")},
       |okb AS (SELECT bucket FROM bo GROUP BY bucket HAVING COUNT(*) <= $LshBucketCap),
       |boc AS (SELECT bo.doc_id, bo.bucket FROM bo JOIN okb USING (bucket)),
       |cand AS (SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
       |         FROM bn n JOIN boc o ON n.bucket = o.bucket),
       |szn AS (SELECT doc_id, COUNT(*) AS n FROM wn GROUP BY doc_id),
       |szo AS (SELECT doc_id, COUNT(*) AS n FROM wo GROUP BY doc_id),
       |inter AS (SELECT c.nid, c.oid, COUNT(*) AS i
       |          FROM cand c JOIN wn x ON x.doc_id = c.nid
       |                      JOIN wo y ON y.doc_id = c.oid AND y.word = x.word
       |          GROUP BY c.nid, c.oid),
       |conf AS (SELECT i.nid, i.oid FROM inter i
       |         JOIN szn ON szn.doc_id = i.nid JOIN szo ON szo.doc_id = i.oid
       |         WHERE 19 * i.i >= 9 * (szn.n + szo.n))""".stripMargin

  /** Duplicated-gram-hash sets at or under this row count ride a broadcast
    * in [[spanDup]]'s semi-join (4M hashes ~ 32 MB built); above it the
    * shuffle join holds. */
  val SpanDupBroadcastCap: Long = 1L << 22

  /** Exact 8-token substring-span dedup over a (doc_id, text) frame — the
    * d_span_dup body (see the QueryDef comment for semantics and the 100 TB
    * shape). Extracted so specs can feed planted fixtures. */
  def spanDup(d: DataFrame): DataFrame = {
    // gram identity via composed xxhash64 (per-word pre-hash once per doc,
    // then one hash of each 8-long slice) instead of the former
    // md5-derived h60 over the joined gram STRING: the hash never reaches
    // the output — only gram EQUALITY matters — so any collision-free hash
    // yields the identical result (the DuckDB oracle keeps its own md5
    // formulation and the d_span_dup gate verifies the equivalence at
    // every scale; a 64-bit collision across distinct grams is ~1e-7 at
    // 10^6 grams). xxhash64 is a native codegen hash an order of magnitude
    // cheaper per gram than md5 + hex conv, and hashing the pre-hashed
    // slice avoids re-building + re-scanning the ~50-byte gram string.
    // >= 8 tokens as an rlike on the RAW text (8 non-space runs separated
    // by whitespace — \S+ and \s+ are disjoint classes, so the match is
    // deterministic and linear): a size(ws) filter is pushed below the
    // projection and re-runs the full token extraction per row
    val w8 = d.filter(col("text").rlike("\\S+(\\s+\\S+){7}"))
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
    // the gram frame is PINNED: three consumers below (the dup-hash
    // aggregate, the semi-join probe side, and the per-doc gram counts)
    // would otherwise each re-run the tokenize+explode+hash pipeline —
    // the operator's dominant map-side cost — as separate subplans
    val g = w8
      .withColumn("hws", transform(col("ws"), w => xxhash64(w)))
      .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 7)))
      .select(col("doc_id"), col("i").cast("long").as("i"),
        xxhash64(slice(col("hws"), col("i"), lit(8))).as("gh"))
      .localCheckpoint()
    // n_grams = size(ws) - 7 = exactly the gram rows a doc contributes, so
    // the per-doc total comes from the pinned frame — no second tokenize
    val docsN = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    // "appears in >= 2 distinct docs" as min != max: a one-phase min/max
    // aggregate combines map-side (the shuffle carries one row per gram
    // hash), where countDistinct would shuffle every (gh, doc_id) pair.
    // Pinned so the adaptive side-switch below can count it without
    // re-running the aggregation.
    val dupHashes = g.groupBy("gh")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("gh")
      .localCheckpoint()
    // scale-adaptive semi-join side (the ccLabels device): the duplicated
    // gram-hash set is 8 bytes/row — under the cap it BROADCASTS, so the
    // 8n-row gram frame is never shuffled for the join and stays in the
    // input's doc-aligned partitioning, where the per-doc islands
    // aggregation below combines map-side to one row per doc before its
    // exchange (the former shuffle semi-join moved every gram row twice:
    // once to gh partitions for the join, once back to doc partitions).
    // Above the cap the shuffle join is the only shape that holds.
    val dupSide =
      if (dupHashes.count() <= SpanDupBroadcastCap) broadcast(dupHashes) else dupHashes
    // gaps-and-islands per doc over the duplicated positions: ONE hash
    // aggregation collecting each doc's sorted position array + the
    // codegen MaxConsecRun scan — the former window formulation paid a
    // full exchange+SORT of every duplicated gram row plus two grouped
    // aggregations for the same numbers (dup_grams = count of duplicated
    // positions; max_span = longest consecutive run + 7)
    val pd = g.join(dupSide, Seq("gh"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dup_grams"),
        (graft.plans.MaxConsecRun(sort_array(collect_list(col("i")))) + lit(7L)).as("max_span"))
    docsN.join(pd, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("max_span"), lit(0L)).as("max_span"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(

    // contrastive negative sampling: K deterministic hash-drawn negatives
    // per document (the contrastive-training pair generator). doc ids are
    // dense 0..N-1, so the draw h60("neg:i:k") % N joins straight back to
    // the corpus in one shuffle equi-join — no per-row random state, no
    // driver sampling, reproducible across engines; a self-draw remaps to
    // the next id (mirrored in the oracle). At 10^12 docs this is a plain
    // N*K-row equi-join on the id.
    QueryDef.sql("d_neg_pairs", {
      val h = graft.core.PortableHash.duckSql(
        "('neg:' || CAST(d.doc_id AS VARCHAR) || ':' || CAST(k.k AS VARCHAR))")
      s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
         |raw AS (
         |  SELECT d.doc_id, k.k, ($h % (SELECT n FROM n)) AS neg0
         |  FROM documents d, (SELECT UNNEST([0,1,2,3]) AS k) k),
         |r AS (SELECT doc_id, k,
         |        CASE WHEN neg0 = doc_id THEN (neg0 + 1) % (SELECT n FROM n)
         |             ELSE neg0 END AS neg FROM raw)
         |SELECT r.doc_id, CAST(r.k AS BIGINT) AS k, r.neg, g.lang AS neg_lang
         |FROM r JOIN documents g ON g.doc_id = r.neg
         |ORDER BY 1, 2""".stripMargin
    }) { (s, dir) =>
      val d = docs(s, dir)
      val n = d.count()
      val h = graft.sources.ImageTable.h60(
        concat(lit("neg:"), col("doc_id").cast("string"), lit(":"), col("k").cast("string")))
      val draws = d.select(col("doc_id"))
        .withColumn("k", explode(sequence(lit(0L), lit(3L))))
        .withColumn("neg0", h % n)
        .withColumn("neg", when(col("neg0") === col("doc_id"), (col("neg0") + 1) % n)
          .otherwise(col("neg0")))
        .drop("neg0")
      val corpus = d.select(col("doc_id").as("neg"), col("lang").as("neg_lang"))
      draws.join(corpus, Seq("neg"))
        .select(col("doc_id"), col("k"), col("neg"), col("neg_lang"))
        .orderBy("doc_id", "k")
    },

    // exact dedup over planted duplicates (the source table has none):
    // rows with doc_id % 5 == 0 are re-inserted under doc_id + 10^7
    QueryDef.sql("d_dedup_exact",
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
         |)
         |SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper, COUNT(*) AS n
         |FROM all_docs GROUP BY md5(text) HAVING COUNT(*) > 1
         |ORDER BY text_hash""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val planted = d.filter(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000000L)
      d.unionByName(planted)
        .groupBy(md5(col("text").cast("binary")).as("text_hash"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy("text_hash")
    },

    QueryDef.sql("d_tokcount",
      s"""SELECT doc_id,
         |  CAST(len($duckWords) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
         |  CAST(length(text) AS BIGINT) AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(expr(wordsExpr)).cast("long").as("n_tokens"),
        size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
          .cast("long").as("n_bpeish"),
        length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },

    // quality scoring with pure integer arithmetic (no ratio division)
    QueryDef.sql("d_quality",
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
         |  CAST(len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is)\\b')) AS BIGINT) AS n_stop,
         |  CAST(3 * len(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is)\\b'))
         |     - len(regexp_extract_all(text, '[.!?,;:]'))
         |     + LEAST(length(text), 500) AS BIGINT) AS score
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val stop = size(expr("regexp_extract_all(text, '\\\\b(the|a|of|and|to|in|is)\\\\b', 0)")).cast("long")
      val punct = size(expr("regexp_extract_all(text, '[.!?,;:]', 0)")).cast("long")
      docs(s, dir).select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        punct.as("n_punct"), stop.as("n_stop"),
        (lit(3) * stop - punct + least(length(col("text")).cast("long"), lit(500L))).as("score"))
        .orderBy("doc_id")
    },

    // language-ID heuristic: argmax of per-language stopword hit counts
    // (fixed priority on ties: en > de > fr > es > zh > unk)
    QueryDef.sql("d_langid", {
      val langs = Seq(
        "en" -> "the|a|of|and|to|is",
        "de" -> "der|die|das|und|ist",
        "fr" -> "le|la|les|et|est",
        "es" -> "el|la|los|y|es",
        "zh" -> "de|shi|le|zai|he")
      val cnt = langs.map { case (l, ws) =>
        s"len(regexp_extract_all(text, '\\b($ws)\\b')) AS c_$l" }.mkString(", ")
      val best = "GREATEST(c_en, c_de, c_fr, c_es, c_zh)"
      s"""SELECT doc_id, lang,
         |  CASE WHEN $best = 0 THEN 'unk'
         |       WHEN c_en = $best THEN 'en' WHEN c_de = $best THEN 'de'
         |       WHEN c_fr = $best THEN 'fr' WHEN c_es = $best THEN 'es'
         |       ELSE 'zh' END AS guess
         |FROM (SELECT doc_id, lang, $cnt FROM documents) t ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val langs = Seq(
        "en" -> "the|a|of|and|to|is",
        "de" -> "der|die|das|und|ist",
        "fr" -> "le|la|les|et|est",
        "es" -> "el|la|los|y|es",
        "zh" -> "de|shi|le|zai|he")
      val withCounts = langs.foldLeft(docs(s, dir)) { case (df, (l, ws)) =>
        df.withColumn(s"c_$l",
          size(expr(s"regexp_extract_all(text, '\\\\b($ws)\\\\b', 0)")))
      }
      val best = greatest(langs.map(l => col(s"c_${l._1}")): _*)
      withCounts.select(col("doc_id"), col("lang"),
        when(best === 0, "unk")
          .when(col("c_en") === best, "en").when(col("c_de") === best, "de")
          .when(col("c_fr") === best, "fr").when(col("c_es") === best, "es")
          .otherwise("zh").as("guess"))
        .orderBy("doc_id")
    },

    // document fingerprint: order-free xor over the distinct word-hash set
    QueryDef.sql("d_fingerprint",
      s"""SELECT doc_id, COUNT(*) AS n_distinct_words,
         |  CAST(bit_xor(${duckH60word("word")}) AS BIGINT) AS fp
         |FROM $duckDocWords w GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docWords(s, dir)
        .select(col("doc_id"), expr(h60word("word")).as("hw"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_words"), expr("bit_xor(hw)").as("fp"))
        .orderBy("doc_id")
    },

    // simhash (16-bit over the distinct word set)
    QueryDef.sql("d_simhash", {
      val bits = (0 until 16).map { b =>
        s"CASE WHEN SUM(CASE WHEN (hw >> $b) % 2 = 1 THEN 1 ELSE -1 END) >= 0 THEN ${1 << b} ELSE 0 END"
      }.mkString(" + ")
      s"""SELECT doc_id, CAST($bits AS BIGINT) AS simhash
         |FROM (SELECT doc_id, ${duckH60word("word")} AS hw FROM $duckDocWords w) t
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val hw = docWords(s, dir).select(col("doc_id"), expr(h60word("word")).as("hw"))
      val bitSums = (0 until 16).map { b =>
        sum(when(shiftright(col("hw"), b) % 2 === 1, 1).otherwise(-1)).as(s"s_$b")
      }
      val sim = (0 until 16).map { b =>
        when(col(s"s_$b") >= 0, 1L << b).otherwise(0L)
      }.reduce(_ + _)
      hw.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), sim.cast("long").as("simhash"))
        .orderBy("doc_id")
    },

    // minhash + LSH banding + exact-Jaccard confirm: 32 hashes in 2 bands
    // of 16 rows generate candidate pairs (planted exact dups — doc_id % 7
    // re-inserted — collide in every band), then the exact integer
    // predicate J >= 0.9 (19*|inter| >= 9*(|A|+|B|)) confirms on the real
    // word sets. Candidate generation AND confirm are mirrored in the
    // oracle, so the gate is bit-exact.
    //
    // HOT-BUCKET CAP (the band analogue of the DF cap): buckets holding
    // more than LshBucketCap docs are skipped for candidate generation —
    // a bucket that large means "everything here duplicates everything"
    // (quadratic in-bucket pairs; a representative-picking pass, not a
    // pair list, is the right tool for such clusters). The cap is mirrored
    // in the oracle, so the gate stays bit-exact at every scale; dropped
    // buckets are observable via minhashBucketStats (0 at the sf0.01 gate
    // scale, where the largest bucket holds 104 docs).
    QueryDef.sql("d_minhash_lsh",
      s"""WITH $minhashOracleCtes
         |SELECT a, b, i, sa.n AS na, sb.n AS nb
         |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |WHERE 19 * i >= 9 * (sa.n + sb.n)
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      minhashConfirmedPairs(s, dir).orderBy("a", "b")
    },

    // near-dup GROUPING: connected components over the confirmed minhash
    // pair graph — the step a dedup pipeline actually needs after pair
    // finding (pairs -> groups -> one canonical representative per group).
    // Spark side is iterative min-label propagation (HashMin), the standard
    // shuffle-native CC algorithm at scale: each round is one equi-join +
    // one min-aggregate, lineage truncated per round, converging in
    // O(component diameter) rounds (near-dup clusters are dense, so 2-3).
    // The oracle computes the same fixpoint by a completely different
    // algorithm — a recursive-CTE transitive closure + MIN — so engine and
    // oracle share nothing beyond the pair CTEs. Output is one row per
    // component: representative (= min doc_id), member count, and an
    // order-free xor digest of the member set (hash-stable membership
    // without quadratic row lists).
    QueryDef.sql("d_dup_groups",
      s"""WITH RECURSIVE $minhashOracleCtes,
         |$dupCompCtes
         |SELECT component, COUNT(*) AS n_members,
         |  CAST(bit_xor(id) AS BIGINT) AS member_xor
         |FROM comp GROUP BY component ORDER BY component""".stripMargin) { (s, dir) =>
      dupLabels(s, dir)
        .groupBy(col("lab").as("component"))
        .agg(count(lit(1)).as("n_members"), expr("bit_xor(id)").as("member_xor"))
        .orderBy("component")
    },

    // dedup OUTPUT (the step the grouping exists for): drop every non-
    // representative member of each near-dup component, keep everything
    // else, and emit the surviving corpus per language (count + an
    // order-free xor of the surviving doc ids — row count stays linear
    // while every kept id is pinned). The corpus is the same base+planted
    // set the pair pipeline scans; the representative is the component's
    // min doc_id, so every planted duplicate (id+20000000) drops and its
    // source survives.
    QueryDef.sql("d_dup_reps",
      s"""WITH RECURSIVE $minhashOracleCtes,
         |$dupCompCtes,
         |corpus AS (SELECT doc_id, lang FROM documents
         |           UNION ALL
         |           SELECT doc_id + 20000000, lang FROM documents WHERE doc_id % 7 = 0),
         |dropids AS (SELECT id FROM comp WHERE id <> component)
         |SELECT lang, COUNT(*) AS n_kept, CAST(bit_xor(doc_id) AS BIGINT) AS kept_xor
         |FROM corpus WHERE doc_id NOT IN (SELECT id FROM dropids)
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "lang")
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0).withColumn("doc_id", col("doc_id") + 20000000L))
      // non-representative members of any component; broadcast anti-join —
      // the drop list is bounded by the duplicate count, orders of
      // magnitude smaller than the corpus
      val drop = dupLabels(s, dir).filter(col("id") =!= col("lab"))
        .select(col("id").as("doc_id"))
      corpus.join(broadcast(drop), Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), expr("bit_xor(doc_id)").as("kept_xor"))
        .orderBy("lang")
    },

    // INCREMENTAL near-dup dedup: screen a NEW ingestion batch against the
    // EXISTING corpus (the shape every continuously-fed pipeline runs —
    // full-corpus re-dedup per batch is not an option at 100 TB). The
    // batch plants re-ingested verbatim docs (doc_id % 3 = 0, expected
    // flagged) and novel docs (doc_id % 3 = 1 truncated to the first half
    // of their words, Jaccard ~0.5-0.8 vs their source — mostly below the
    // 0.9 bar). Candidates come from the band-bucket EQUI-join of batch
    // bands against corpus bands (corpus side capped, oracle-mirrored);
    // the exact-Jaccard confirm and the 19i >= 9(na+nb) integer form are
    // the d_minhash_lsh machinery over the (new, old) restriction. At
    // scale the corpus band table is the precomputed index (bucketed on
    // disk); only the small batch is signed per run, so the join is
    // batch-broadcast-sized. Output: per batch doc, match count and the
    // minimal matching corpus id (-1 = genuinely new).
    QueryDef.sql("d_incr_dedup", {
      val half = s"array_to_string(($duckWords)[1:len($duckWords)//2], ' ')"
      s"""WITH newd AS (
         |  SELECT doc_id + 30000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id + 30000000 AS doc_id, $half AS text
         |  FROM documents WHERE doc_id % 3 = 1),
         |${minhashSigCtes("documents", "o")},
         |${minhashSigCtes("newd", "n")},
         |okb AS (SELECT bucket FROM bo GROUP BY bucket HAVING COUNT(*) <= $LshBucketCap),
         |boc AS (SELECT bo.doc_id, bo.bucket FROM bo JOIN okb USING (bucket)),
         |cand AS (SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid
         |         FROM bn n JOIN boc o ON n.bucket = o.bucket),
         |szn AS (SELECT doc_id, COUNT(*) AS n FROM wn GROUP BY doc_id),
         |szo AS (SELECT doc_id, COUNT(*) AS n FROM wo GROUP BY doc_id),
         |inter AS (SELECT c.nid, c.oid, COUNT(*) AS i
         |          FROM cand c JOIN wn x ON x.doc_id = c.nid
         |                      JOIN wo y ON y.doc_id = c.oid AND y.word = x.word
         |          GROUP BY c.nid, c.oid),
         |conf AS (SELECT i.nid, i.oid FROM inter i
         |         JOIN szn ON szn.doc_id = i.nid JOIN szo ON szo.doc_id = i.oid
         |         WHERE 19 * i.i >= 9 * (szn.n + szo.n)),
         |agg AS (SELECT nid, COUNT(*) AS n_matches, MIN(oid) AS keeper
         |        FROM conf GROUP BY nid)
         |SELECT newd.doc_id AS new_id, COALESCE(n_matches, 0) AS n_matches,
         |  COALESCE(keeper, -1) AS keeper
         |FROM newd LEFT JOIN agg ON agg.nid = newd.doc_id
         |ORDER BY new_id""".stripMargin
    }) { (s, dir) =>
      val base = docs(s, dir).select("doc_id", "text")
      val dup = base.filter(col("doc_id") % 3 === 0)
        .withColumn("doc_id", col("doc_id") + 30000000L)
      val novel = base.filter(col("doc_id") % 3 === 1)
        .withColumn("doc_id", col("doc_id") + 30000000L)
        .withColumn("text",
          expr(s"array_join(slice($wordsExpr, 1, size($wordsExpr) div 2), ' ')"))
      val batch = dup.unionByName(novel)
      val (wOld, bOld) = wordsAndBands(base)
      val (wNew, bNew) = wordsAndBands(batch)
      // sizes ride the band rows; the Jaccard confirm intersects the
      // per-doc word arrays (same device as minhashConfirmedPairs)
      val cand = bNew.as("n")
        .join(cappedBuckets(bOld, "bucket", LshBucketCap).as("o"), Seq("bucket"))
        .select(col("n.doc_id").as("nid"), col("o.doc_id").as("oid"),
          col("n.n").as("nn"), col("o.n").as("no")).distinct()
      val conf = cand
        .join(wNew.select(col("doc_id").as("nid"), col("words").as("wn")), Seq("nid"))
        .join(wOld.select(col("doc_id").as("oid"), col("words").as("wo")), Seq("oid"))
        .withColumn("i", size(array_intersect(col("wn"), col("wo"))).cast("long"))
        .filter(lit(19) * col("i") >= lit(9) * (col("nn") + col("no")))
      val agg = conf.groupBy("nid")
        .agg(count(lit(1)).as("n_matches"), min("oid").as("keeper"))
      batch.select(col("doc_id").as("new_id"))
        .join(agg, col("new_id") === col("nid"), "left")
        .select(col("new_id"),
          coalesce(col("n_matches"), lit(0L)).as("n_matches"),
          coalesce(col("keeper"), lit(-1L)).as("keeper"))
        .orderBy("new_id")
    },

    // exact substring-span dedup (the Lee et al. "Deduplicating Training
    // Data" modality — the third dedup family besides whole-doc exact and
    // MinHash near-dup): a doc position is DUPLICATED when its 8-token gram
    // appears verbatim in at least one OTHER document. Per doc: total gram
    // positions, duplicated positions, and the longest maximal duplicated
    // span in tokens (consecutive dup positions merged gaps-and-islands
    // style — see spanDup for the round-6 sorted-array formulation).
    // Shape for 100 TB: the gram explode is map-side (~L rows per doc),
    // the duplicate test is one groupBy on the gram hash (a hot gram is
    // ONE row after the agg) plus a scale-adaptive semi-join back, and
    // the islands aggregation partitions by doc_id — parallel everywhere,
    // no driver state. The engine keys on composed xxhash64, the oracle
    // on its md5 h60 — both collision-free on the gram set, so the dup
    // STRUCTURE (the only thing the hash feeds) agrees; the gate verifies
    // that at every scale. Oracle-side `range(1, 256)` is the replay
    // device for the lateral positions (corpus max is 100 tokens), not an
    // engine capacity.
    QueryDef.sql("d_span_dup", {
      val gh = PortableHash.duckSql("array_to_string(ws[i:i+7], ' ')")
      s"""WITH w8 AS (SELECT doc_id, $duckWords AS ws,
         |      len($duckWords) - 7 AS n_grams FROM documents
         |    WHERE len($duckWords) >= 8),
         |g AS (SELECT doc_id, CAST(i AS BIGINT) AS i, $gh AS gh
         |      FROM w8, unnest(range(1, 256)) r(i) WHERE i <= n_grams),
         |dp AS (SELECT doc_id, i,
         |         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |       FROM g WHERE gh IN (SELECT gh FROM g GROUP BY gh
         |                           HAVING COUNT(DISTINCT doc_id) >= 2)),
         |runs AS (SELECT doc_id, grp, COUNT(*) AS run FROM dp GROUP BY doc_id, grp),
         |pd AS (SELECT doc_id, CAST(SUM(run) AS BIGINT) AS dup_grams,
         |         CAST(MAX(run) + 7 AS BIGINT) AS max_span FROM runs GROUP BY doc_id)
         |SELECT w8.doc_id AS doc_id, CAST(n_grams AS BIGINT) AS n_grams,
         |  COALESCE(dup_grams, 0) AS dup_grams, COALESCE(max_span, 0) AS max_span
         |FROM w8 LEFT JOIN pd ON w8.doc_id = pd.doc_id ORDER BY w8.doc_id""".stripMargin
    }) { (s, dir) => spanDup(docs(s, dir)) },

    // document chunking (the RAG / training-window step): overlapping
    // 64-token windows at stride 48 per document, entirely map-side (one
    // explode, no shuffle until the per-doc aggregate). Chunk identity is
    // an md5 fingerprint of the joined tokens; the per-doc xor digest
    // keeps the gate row count linear while pinning every chunk's content.
    QueryDef.sql("d_chunking",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |c AS (SELECT doc_id,
         |        array_to_string(ws[CAST(i * 48 + 1 AS BIGINT):CAST(i * 48 + 64 AS BIGINT)], ' ') AS chunk
         |      FROM w, UNNEST(range((len(ws) + 47) // 48)) AS t(i)
         |      WHERE len(ws) > 0)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  CAST(bit_xor(${PortableHash.duckSql("chunk")}) AS BIGINT) AS chunk_xor
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), expr(wordsExpr).as("ws"))
        .filter(size(col("ws")) > 0)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(0, (size(ws) + 47) div 48 - 1), " +
              "i -> concat_ws(' ', slice(ws, i * 48 + 1, 64)))")).as("chunk"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          expr(s"bit_xor(${PortableHash.sparkSql("chunk")})").as("chunk_xor"))
        .orderBy("doc_id")
    },

    // sequence packing (the tokenize-and-pack step of a training
    // pipeline): documents in doc_id order are packed contiguously into
    // 512-token training sequences; a document belongs to the sequence its
    // first token lands in. The global running token count is computed as
    // a DISTRIBUTED prefix sum — range-partition by doc_id, per-partition
    // cumulative window, then each partition adds the broadcast sum of all
    // earlier partitions — so no single-partition global window ever sees
    // the full corpus (the naive formulation is a sequential scan; this
    // shape is how it survives 100 TB). The oracle is the naive one-window
    // cumsum, so engine and oracle share no execution plan.
    QueryDef.sql("d_seq_pack",
      s"""WITH t AS (SELECT doc_id, CAST(len($duckWords) AS BIGINT) AS n FROM documents),
         |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id) AS cum FROM t)
         |SELECT CAST((cum - n) // 512 AS BIGINT) AS seq_id, COUNT(*) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS sum_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1 ORDER BY seq_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select(col("doc_id"), size(expr(wordsExpr)).cast("long").as("n"))
      // output is invariant to the partition count (cum is global either
      // way); width just follows the session's parallelism
      val nParts = math.max(8, s.sparkContext.defaultParallelism)
      val parted = toks.repartitionByRange(nParts, col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val wLocal = Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = parted.withColumn("cum_local", sum("n").over(wLocal))
      // per-partition totals -> exclusive running offset (tiny frame:
      // one row per partition, safe to window without a partition key)
      val wOff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = local.groupBy("pid").agg(sum("n").as("ptotal"))
        .withColumn("offset", coalesce(sum("ptotal").over(wOff), lit(0L)))
        .select("pid", "offset")
      local.join(broadcast(offsets), Seq("pid"))
        .withColumn("cum", col("cum_local") + col("offset"))
        .withColumn("seq_id", expr("(cum - n) div 512")) // integer div: exact past 2^53
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("seq_id")
    },

    // intra-document repetition (Gopher-style quality filter): the
    // duplicated-word-bigram fraction per document. All map-side gram
    // construction + one per-doc aggregate; the repetition flag fires when
    // > 10% of a doc's bigrams are repeats (10*(n - n_distinct) > n,
    // integer-exact; fires on 9/500 docs at the gate scale — measured
    // median dup fraction 2.8%, max 13.3%). Docs shorter than 2 words have
    // no bigrams and are excluded by the same guard in both engines.
    QueryDef.sql("d_repetition",
      s"""WITH ws AS (SELECT doc_id, $duckWords AS w FROM documents),
         |g AS (SELECT doc_id, array_to_string(w[CAST(i + 1 AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS gram
         |      FROM ws, UNNEST(range(len(w) - 1)) AS t(i)
         |      WHERE len(w) >= 2)
         |SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT gram) AS n_distinct,
         |  CASE WHEN 10 * (COUNT(*) - COUNT(DISTINCT gram)) > COUNT(*)
         |       THEN 'true' ELSE 'false' END AS repetitive
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), expr(wordsExpr).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, size(w) - 2), i -> concat_ws(' ', slice(w, i + 1, 2)))"))
            .as("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), countDistinct("gram").as("n_distinct"))
        .withColumn("repetitive",
          (lit(10) * (col("n_grams") - col("n_distinct")) > col("n_grams")).cast("string"))
        .orderBy("doc_id")
    },

    // train/eval decontamination: flag training documents sharing any word
    // 4-gram with the held-out eval slice (doc_id % 97 == 0) — the standard
    // benchmark-leakage scan. The eval gram set is tiny by construction, so
    // the overlap join BROADCASTS it and the training mass streams map-side
    // (never shuffled); gram width is a parameter (4 here so the synthetic
    // small-vocabulary corpus yields a non-trivial overlap set).
    QueryDef.sql("d_decontam",
      s"""WITH ws AS (SELECT doc_id, $duckWords AS w FROM documents),
         |g AS (SELECT doc_id, array_to_string(w[CAST(i + 1 AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS gram
         |      FROM ws, UNNEST(range(len(w) - 3)) AS t(i)
         |      WHERE len(w) >= 4),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
         |tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
         |SELECT tr.doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN ev USING (gram)
         |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val g = docs(s, dir)
        .select(col("doc_id"), expr(wordsExpr).as("w"))
        .filter(size(col("w")) >= 4)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, size(w) - 4), i -> concat_ws(' ', slice(w, i + 1, 4)))"))
            .as("gram"))
      val ev = g.filter(col("doc_id") % 97 === 0).select("gram").distinct()
      val tr = g.filter(col("doc_id") % 97 =!= 0).select("doc_id", "gram").distinct()
      tr.join(broadcast(ev), Seq("gram"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },

    // PII scrubbing: redact email-shaped and long-digit-run tokens (the
    // standard pre-training cleanup pass), map-side regexp_replace only —
    // no shuffle until the summary aggregate. Counts are derived from
    // length deltas so both engines agree exactly; the per-row scrubbed
    // text is hash-gated through its md5.
    QueryDef.sql("d_pii_scrub", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
      val digits = "[0-9]{6,}"
      s"""SELECT doc_id,
         |  md5(regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
         |      '$digits', '<NUM>', 'g')) AS scrubbed_md5,
         |  CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$digits')) AS BIGINT) AS n_num
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
      val digits = "[0-9]{6,}"
      docs(s, dir).select(col("doc_id"),
        md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>").cast("binary")).as("scrubbed_md5"),
        size(expr(s"regexp_extract_all(text, '$email', 0)")).cast("long").as("n_email"),
        size(expr(s"regexp_extract_all(text, '$digits', 0)")).cast("long").as("n_num"))
        .orderBy("doc_id")
    },

    // exact discrete quantiles of document length (the cutoff-picking step
    // of a quality filter): p_q = smallest len whose cumulative count
    // reaches ceil(q*n). Computed over the LENGTH HISTOGRAM (distinct
    // lengths only), so the cumulative window runs on a domain-sized frame
    // — the per-document mass is reduced map-side first and never reaches
    // a single partition. All rank arithmetic is integer ceil-division,
    // bit-exact in both engines; no interpolation, no approx sketches.
    QueryDef.sql("q_quantiles",
      s"""WITH lens AS (SELECT CAST(length(text) AS BIGINT) AS len FROM documents),
         |hist AS (SELECT len, COUNT(*) AS c FROM lens GROUP BY len),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
         |cum AS (SELECT len, CAST(SUM(c) OVER (ORDER BY len) AS BIGINT) AS cum FROM hist)
         |SELECT (SELECT n FROM tot) AS n,
         |  (SELECT MIN(len) FROM cum WHERE cum >= ((SELECT n FROM tot) + 1) // 2) AS p50,
         |  (SELECT MIN(len) FROM cum WHERE cum >= (9 * (SELECT n FROM tot) + 9) // 10) AS p90,
         |  (SELECT MIN(len) FROM cum WHERE cum >= (99 * (SELECT n FROM tot) + 99) // 100) AS p99""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hist = docs(s, dir)
        .select(length(col("text")).cast("long").as("len"))
        .groupBy("len").agg(count(lit(1)).as("c"))
      val tot = hist.agg(sum("c").cast("long").as("n"))
      val cum = hist
        .withColumn("cum", sum("c").over(
          Window.orderBy("len").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
      cum.agg(
        max(col("n")).as("n"),
        min(when(col("cum") >= expr("(n + 1) div 2"), col("len"))).as("p50"),
        min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("len"))).as("p90"),
        min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("len"))).as("p99"))
    },

    // deterministic stratified sampling + train/val/test split — the
    // selection machinery of a training-data pipeline. Sampling is a pure
    // hash-threshold per row (per-language rates: en 100%, de/fr 50%,
    // es 25%, else 10%), the split is an independent hash in 98/1/1
    // proportions; both are map-side-only decisions (no shuffle until the
    // final count), reproducible bit-for-bit in the oracle, and stable
    // under any row order — exactly what resumable 100 TB sampling needs.
    QueryDef.sql("d_split_sample", {
      val h = PortableHash.duckSql("('smp:' || CAST(doc_id AS VARCHAR))")
      val hs = PortableHash.duckSql("('spl:' || CAST(doc_id AS VARCHAR))")
      s"""SELECT lang, split, COUNT(*) AS n, CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
         |FROM (
         |  SELECT doc_id, lang,
         |    CASE WHEN $hs % 100 < 98 THEN 'train'
         |         WHEN $hs % 100 = 98 THEN 'val' ELSE 'test' END AS split
         |  FROM documents
         |  WHERE $h % 100 < (CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
         |                    WHEN 'fr' THEN 50 WHEN 'es' THEN 25 ELSE 10 END)) t
         |GROUP BY lang, split ORDER BY lang, split""".stripMargin
    }) { (s, dir) =>
      val h = expr(PortableHash.sparkSql("('smp:' || CAST(doc_id AS STRING))"))
      val hs = expr(PortableHash.sparkSql("('spl:' || CAST(doc_id AS STRING))"))
      val rate = when(col("lang") === "en", 100).when(col("lang") === "de", 50)
        .when(col("lang") === "fr", 50).when(col("lang") === "es", 25).otherwise(10)
      docs(s, dir)
        .filter(h % 100 < rate)
        .withColumn("split",
          when(hs % 100 < 98, "train").when(hs % 100 === 98, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"), expr("bit_xor(doc_id)").as("id_xor"))
        .orderBy("lang", "split")
    },

    // DSIR-style importance weighting + resampling (Xie et al. 2023,
    // "Data Selection for Language Models via Importance Resampling"),
    // integer-exact variant: features are hashed token BIGRAMS in 4096
    // buckets; each bucket's target-likeness is the permille share of its
    // occurrences coming from the target slice (lang = 'en'); a document's
    // score is the occurrence-weighted mean bucket permille; the resample
    // keeps the doc when an independent hash draw falls under score/1000 —
    // keep probability proportional to target-likeness, zero per-row random
    // state. Shape for 100 TB: bigram explode is map-side, the bucket table
    // aggregates to a FIXED 4096 rows (broadcast back), per-doc agg is one
    // shuffle — no global sort, no driver pass. The 4096-bucket hash table
    // is DSIR's own dimensionality-reduction device (a modeling constant),
    // not a data-capacity cap.
    QueryDef.sql("d_dsir", {
      val bh = PortableHash.duckSql("(ws[i] || ' ' || ws[i+1])")
      val hd = PortableHash.duckSql("('dsir:' || CAST(doc_id AS VARCHAR))")
      s"""WITH w AS (SELECT doc_id, lang, $duckWords AS ws FROM documents
         |           WHERE len($duckWords) >= 2),
         |bg AS (SELECT doc_id, lang, $bh % 4096 AS b
         |       FROM w, unnest(range(1, 256)) r(i) WHERE i <= len(ws) - 1),
         |bt AS (SELECT b, COUNT(*) AS call,
         |         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ctgt
         |       FROM bg GROUP BY b),
         |db AS (SELECT doc_id, b, COUNT(*) AS cnt FROM bg GROUP BY doc_id, b),
         |sc AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(cnt * ((1000 * ctgt) // call)) // SUM(cnt) AS BIGINT) AS score
         |       FROM db JOIN bt USING (b) GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, score,
         |  CAST(CASE WHEN $hd % 1000 < score THEN 1 ELSE 0 END AS BIGINT) AS sampled
         |FROM sc ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val bg = docs(s, dir)
        .select(col("doc_id"), col("lang"), expr(wordsExpr).as("ws"))
        .filter(size(col("ws")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("ws")) - 1)))
        .select(col("doc_id"), col("lang"),
          (expr(PortableHash.sparkSql(
            "concat(element_at(ws, i), ' ', element_at(ws, i + 1))")) % 4096).as("b"))
      val bt = bg.groupBy("b").agg(count(lit(1)).as("call"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ctgt"))
      val db = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))
      val hd = expr(PortableHash.sparkSql("('dsir:' || CAST(doc_id AS STRING))"))
      db.join(broadcast(bt), Seq("b"))
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_bigrams"),
          expr("sum(cnt * ((1000 * ctgt) div call)) div sum(cnt)").as("score"))
        .withColumn("sampled", when(hd % 1000 < col("score"), 1L).otherwise(0L))
        .select("doc_id", "n_bigrams", "score", "sampled")
        .orderBy("doc_id")
    },

    // vocabulary build: top-40 words by document frequency with a
    // deterministic tie-break (df DESC, word ASC) — one map-side explode +
    // one DF aggregation + orderBy().limit(), which Spark plans as
    // TakeOrderedAndProject: per-partition top-k heaps merged at the
    // driver, so the full distinct-word table never funnels through one
    // partition (a bare row_number window with no PARTITION BY would).
    // Rank is assigned afterwards over the 40 survivors only.
    // salient-term extraction: top-3 terms per document ordered by term
    // frequency, then rarity (ascending document frequency), then term —
    // the tf-idf ranking made integer-exact (ln(N/df) is monotone
    // decreasing in df, so for equal tf the idf order IS the df order; no
    // cross-engine float comparison can diverge). Window partitioned by
    // doc_id — fully parallel at any corpus size.
    QueryDef.sql("d_salient_terms",
      s"""WITH tok AS (SELECT doc_id, unnest($duckWords) AS word FROM documents),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
         |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
         |r AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
         |        row_number() OVER (PARTITION BY tf.doc_id
         |          ORDER BY tf.tf DESC, df.df ASC, tf.word) AS rk
         |      FROM tf JOIN df USING (word))
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, word, tf, df
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir).select(col("doc_id"), explode(expr(wordsExpr)).as("word"))
      val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfq = tok.distinct().groupBy("word").agg(count(lit(1)).as("df"))
      tf.join(dfq, Seq("word"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("tf").desc, col("df").asc, col("word"))))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk").cast("long").as("rk"),
          col("word"), col("tf"), col("df"))
        .orderBy("doc_id", "rk")
    },

    QueryDef.sql("d_vocab",
      s"""SELECT CAST(rk AS BIGINT) AS rk, word, df FROM (
         |  SELECT word, df, row_number() OVER (ORDER BY df DESC, word) AS rk
         |  FROM (SELECT word, COUNT(*) AS df FROM $duckDocWords w GROUP BY word) t) r
         |WHERE rk <= 40 ORDER BY rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val top = docWords(s, dir).groupBy("word").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("word")).limit(40)
      top.withColumn("rk",
          row_number().over(Window.orderBy(col("df").desc, col("word"))))
        .select(col("rk").cast("long").as("rk"), col("word"), col("df"))
        .orderBy("rk")
    },

    // rare-word Jaccard near-dup: pairs with J >= 0.5 over the DF-CAPPED
    // word sets (words in more than 20% of the subset's documents are
    // dropped before the self-equi-join on `word`). The cap is the skew
    // fix: stop-word hot keys made the join quadratic in round 1; capped
    // keys have bounded multiplicity and the common-vocabulary mass (which
    // carries no near-dup signal on this corpus) never enters the shuffle.
    // Integer-exact predicate 3*|inter| >= |A| + |B|; 1-in-10 doc subset.
    QueryDef.sql("d_jaccard",
      s"""WITH w0 AS (SELECT doc_id, word FROM $duckDocWords t WHERE doc_id % 10 = 0),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM w0),
         |keep AS (SELECT word FROM w0 GROUP BY word
         |         HAVING 5 * COUNT(*) <= (SELECT n FROM nd)),
         |w AS (SELECT w0.doc_id, w0.word FROM w0 JOIN keep USING (word)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
         |  FROM w x JOIN w y ON x.word = y.word AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, i, sa.n AS na, sb.n AS nb
         |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |WHERE 3 * i >= sa.n + sb.n
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      val w0 = docWords(s, dir).filter(col("doc_id") % 10 === 0)
      val nd = w0.agg(countDistinct("doc_id").as("nd"))
      // (doc_id, word) is distinct, so count(*) per word IS the document
      // frequency; the 1-row count side cross-joins as a broadcast scalar
      val keep = w0.groupBy("word").agg(count(lit(1)).as("dfc"))
        .crossJoin(broadcast(nd))
        .filter(lit(5) * col("dfc") <= col("nd"))
        .select("word")
      val w = w0.join(keep, Seq("word"), "left_semi")
      val sz = w.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = w.as("x").join(w.as("y"),
          col("x.word") === col("y.word") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sz.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
        .join(sz.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
        .filter(lit(3) * col("i") >= col("na") + col("nb"))
        .select("a", "b", "i", "na", "nb")
        .orderBy("a", "b")
    },

    // character-3-gram Jaccard (shingle near-dup, the n-gram variant of the
    // pipeline): distinct 3-gram sets per doc, DF-capped (40%) like
    // d_jaccard so ubiquitous shingles ("the", " th") never enter the
    // equi-join. Capping removes exactly the shared mass, so the similarity
    // scale compresses: J >= 0.2 on rare-gram sets (6*i >= na+nb, integer
    // exact) is the discriminative band on this corpus (measured max
    // rare-gram J = 0.24 vs 0.66 uncapped); 1-in-20 doc subset
    QueryDef.sql("d_ngram_jaccard",
      s"""WITH g0 AS (
         |  SELECT DISTINCT doc_id, substr(text, i + 1, 3) AS gram
         |  FROM documents, UNNEST(range(length(text) - 2)) AS t(i)
         |  WHERE doc_id % 20 = 0),
         |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM g0),
         |keep AS (SELECT gram FROM g0 GROUP BY gram
         |         HAVING 5 * COUNT(*) <= 2 * (SELECT n FROM nd)),
         |g AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN keep USING (gram)),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
         |  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
         |  GROUP BY x.doc_id, y.doc_id)
         |SELECT a, b, i, sa.n AS na, sb.n AS nb
         |FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |WHERE 6 * i >= sa.n + sb.n
         |ORDER BY a, b""".stripMargin) { (s, dir) =>
      // length guard: Spark's sequence(0, n) DESCENDS when n < 0 (a doc
      // shorter than 3 chars would fabricate grams); DuckDB's range() is
      // empty there, so the guard keeps the engines identical
      val g0 = docs(s, dir).filter(col("doc_id") % 20 === 0 && length(col("text")) >= 3)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, length(text) - 3), i -> substring(text, i + 1, 3))"))
            .as("gram"))
        .distinct()
      val nd = g0.agg(countDistinct("doc_id").as("nd"))
      val keep = g0.groupBy("gram").agg(count(lit(1)).as("dfc"))
        .crossJoin(broadcast(nd))
        .filter(lit(5) * col("dfc") <= lit(2) * col("nd"))
        .select("gram")
      val g = g0.join(keep, Seq("gram"), "left_semi")
      val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = g.as("x").join(g.as("y"),
          col("x.gram") === col("y.gram") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sz.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), Seq("a"))
        .join(sz.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), Seq("b"))
        .filter(lit(6) * col("i") >= col("na") + col("nb"))
        .select("a", "b", "i", "na", "nb")
        .orderBy("a", "b")
    }
  )
}
