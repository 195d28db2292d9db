package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** EXACT variable-length substring deduplication — the Lee et al.
  * ("Deduplicating Training Data Makes Language Models Better")
  * suffix-array method re-expressed for Spark, upgrading the fixed-window
  * approximation of `q_span_dedup`.
  *
  * Semantics. With duplication threshold L tokens: a maximal duplicated
  * substring of length M ≥ L is, position for position, exactly a maximal
  * RUN of token positions whose length-L grams each occur ≥ 2 times in
  * the corpus (a run of R consecutive duplicated gram starts IS a
  * duplicated substring of length R + L − 1, and every duplicated
  * substring ≥ L decomposes into such starts). So the variable-length
  * span report — span count, longest span, tokens covered — is computed
  * EXACTLY from the duplicated-gram-start set plus a per-doc
  * gaps-and-islands pass; no approximation anywhere.
  *
  * Two engines produce that start set, and must agree bit-for-bit:
  *
  *  - [[substrDedup]] (gram path): each position ships one md5 of its
  *    L-token window; a count-over-hash marks starts occurring twice.
  *    One shuffle of O(corpus tokens) fixed-width rows.
  *  - [[substrDedupSA]] (suffix-array path): the PREFIX-DOUBLING
  *    suffix-array construction loop — order-preserving dense ranks of
  *    (rank_k(p), rank_k(p+k)) pairs, doubling k — run to k = 8 and
  *    combined as (rank_8(p), rank_8(p+L−8)), which decides exact
  *    L-prefix equality of suffixes (the sparse-table identity). This is
  *    the distributed SA construction stopped at ⌈log₂L⌉ rounds: dedup
  *    needs only L-level ranks; running the same loop to ⌈log₂n⌉ yields
  *    the full lexicographic suffix array (SuffixArraySpec proves the
  *    ranks order suffixes correctly). Ranks are ints — the 100 TB path
  *    ships NO token text after round one, and each round is a bounded
  *    pair of hash shuffles regardless of corpus size.
  *
  * Scale notes: no all-pairs anywhere; every pass is a key-partitioned
  * shuffle of O(total tokens) rows; the run/coverage rollup windows
  * partition BY DOC (bounded partitions). The oracle replays the whole
  * pipeline in DuckDB with window functions.
  */
object SubstrDedup {
  import Tok.{toksDuck, toksExpr}

  /** Duplication threshold in tokens (Lee et al. use 50 BPE tokens at
    * web scale; the synthetic corpus averages ~56 whitespace tokens per
    * doc, so 15 exercises real multi-span structure). */
  private val L = 15

  // Project `text` away once `toks` is built: every consumer (gram build,
  // rank table, rebuild, symbol stream) reads toks only, and the callers'
  // eager() checkpoints would otherwise materialize the raw text beside
  // the token array — double the bytes for nothing (round 18, measured).
  private def docsToks(s: SparkSession, dir: String): DataFrame =
    graft.Materialize.rebalanced(
      Tables.documents(s, dir).select(col("doc_id"), col("text")))
      .withColumn("toks", expr(toksExpr))
      .select(col("doc_id"), col("toks"))

  /** (doc_id, pos) of every duplicated L-gram start — gram-hash engine. */
  private def dupStartsGram(docs: DataFrame): DataFrame = {
    // unhex: the count-over-hash shuffle carries 16 bytes per gram, not
    // 32 hex chars (same 128 bits; the hash never reaches the output)
    val grams = docs.selectExpr("doc_id",
      s"IF(size(toks) < $L, array(), transform(sequence(1, size(toks) - ${L - 1}), " +
        s"i -> unhex(md5(concat_ws(' ', slice(toks, i, $L)))))) AS gh")
      .select(col("doc_id"), posexplode(col("gh")).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("c") >= 2).select("doc_id", "pos")
  }

  /** Order-preserving distributed rank of `keys`: equal keys get equal
    * ranks, rank order follows key order. Shape (round 18, measured —
    * the previous RDD zipWithIndex + min-over-window form cost 2 extra
    * jobs per call and a full-width non-codegen Row round-trip):
    * DISTINCT keys (map-side partial agg shrinks the shuffle to the key
    * universe) → range-partition + local sort (global key order) →
    * monotonically_increasing_id, which is order-preserving here because
    * range partition ids are ordered and the local sort orders rows
    * within each (id = pid·2³³ + offset; a range partition holding more
    * than 2³³ distinct keys would overflow — far beyond any real split)
    * → hash-join the ranks back onto the rows. Ranks are not dense, but
    * every consumer needs only order/equality, same as before (the old
    * min(_idx) ranks were not dense either). The whole relation is
    * lazyCut-materialized: rank VALUES are partitioning-dependent, so two
    * plan branches recomputing this subtree independently could disagree
    * — the checkpoint makes every consumer read ONE computed copy (the
    * RDD form got this for free by sharing one RDD instance).
    *
    * Round 19: the cut is projected to (doc_id, pos, rk) — consumers read
    * nothing else, and the r18 checkpoint was materializing the join keys
    * (round 0: the 4-token prefix STRING) beside them — and is stored
    * PARTITIONED BY doc_id, SORTED BY (doc_id, pos): every consumer is a
    * per-doc positional window ([[rankTable]]'s lead(rk, k) pairing,
    * [[dupStartsSA]]'s lead(rk, L−8) probe), so the window runs straight
    * off the checkpoint blocks with ZERO further exchange or sort. The
    * prior shape re-exchanged the full position table by (doc_id, pos)
    * TWICE per doubling round for the shifted self-join (verdict r18
    * item 3). */
  private def denseRankBy(df: DataFrame, keys: Seq[String]): DataFrame = {
    val s = df.sparkSession
    val parts = math.max(s.sparkContext.defaultParallelism, 8)
    val ranked = df.select(keys.map(col): _*).distinct()
      .repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .withColumn("rk", monotonically_increasing_id())
    graft.Materialize.lazyCut(df.join(ranked, keys)
      .select(col("doc_id"), col("pos"), col("rk"))
      .repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"), col("pos")))
  }

  /** Per-doc positional window: positions are DENSE (posexplode emits
    * 1..n per doc exactly once), so "the rank at pos + k" is exactly
    * lead(rk, k) over this window — the identity that replaces the old
    * shifted self-join on (doc_id, pos) with an exchange-free window
    * over the doc_id-partitioned, pos-sorted rank checkpoints. */
  private val byDocPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))

  /** Prefix-doubled rank table: (doc_id, pos, rk) where rk orders every
    * suffix by its first `upTo` tokens (upTo a power of two). Running the
    * same loop to 2^⌈log₂n⌉ yields the full lexicographic suffix array;
    * SuffixArraySpec brute-force-proves the ordering. */
  private[graft] def rankTable(docs: DataFrame, upTo: Int): DataFrame = {
    require(upTo >= 1 && (upTo & (upTo - 1)) == 0, s"upTo must be a power of two, got $upTo")
    // round 0: rank the base-width prefix DIRECTLY (DC3-style base
    // seeding — the doubling loop needn't start at single tokens). A
    // 4-token base halves the rank rounds for L = 15; the low separator
    // (0x1F, below every token byte) keeps joined-string order equal to
    // token-sequence order, and a shorter tail prefix sorts first — the
    // suffix-array convention either way.
    val baseW = math.min(4, upTo)
    val base = docs.select(col("doc_id"), posexplode(expr(
      s"IF(size(toks) = 0, array(), transform(sequence(1, size(toks)), " +
        s"i -> concat_ws(chr(31), slice(toks, i, $baseW))))"))
      .as(Seq("p0", "pref")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("pref"))
    var cur = denseRankBy(base, Seq("pref"))
    // doubling rounds: rank_{2k}(p) = dense rank of (rank_k(p), rank_k(p+k));
    // a suffix shorter than 2k ranks with −1 (shorter sorts first — the
    // suffix-array convention). rank_k(p+k) = lead(rk, k) over the per-doc
    // positional window (positions are dense), running exchange-free off
    // the doc_id-partitioned rank checkpoint — the old left-join against a
    // pos-shifted copy exchanged the full position table twice per round.
    var k = baseW
    while (k < upTo) {
      val paired = cur
        .withColumn("rkb", coalesce(lead(col("rk"), k).over(byDocPos), lit(-1L)))
        .withColumnRenamed("rk", "rka")
      cur = denseRankBy(paired, Seq("rka", "rkb"))
      k *= 2
    }
    cur
  }

  /** (doc_id, pos) of every duplicated L-gram start — prefix-doubling
    * suffix-array engine (1→2→4→8 tokens: 3 rounds for L = 15). */
  private def dupStartsSA(docs: DataFrame): DataFrame = {
    val cur = rankTable(docs, 8)
    // exact L-prefix equality off the rank_8 table: (rank_8(p), rank_8(p+L−8)),
    // the shift again a lead() over the per-doc positional window (zero
    // exchanges off the rank checkpoint; the old inner self-join on
    // (doc_id, pos) exchanged the position table twice). The n_toks guard
    // keeps full grams only; pos ≤ n−(L−1) implies pos+(L−8) ≤ n, so the
    // lead is always non-null on surviving rows — the isNotNull filter
    // mirrors the old inner join exactly.
    val off = L - 8
    val nToks = docs.select(col("doc_id"), size(col("toks")).as("n_toks"))
    cur.withColumn("rkb", lead(col("rk"), off).over(byDocPos))
      .filter(col("rkb").isNotNull)
      .join(broadcast(nToks), Seq("doc_id"))
      .filter(col("pos") <= col("n_toks") - (L - 1)) // full grams only
      .withColumn("c", count(lit(1)).over(
        Window.partitionBy(col("rk"), col("rkb"))))
      .filter(col("c") >= 2).select("doc_id", "pos")
  }

  /** Gaps-and-islands rollup: duplicated starts → maximal variable-length
    * spans → per-doc report. Coverage merges overlapping spans exactly
    * (a lag() subtracts the tokens the previous span already covered). */
  private def report(docs: DataFrame, dup: DataFrame): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = dup
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("first"), max(col("pos")).as("last"),
        count(lit(1)).as("n_starts"))
    val byFirst = Window.partitionBy(col("doc_id")).orderBy(col("first"))
    val covered = runs
      .withColumn("prev_last", lag(col("last"), 1).over(byFirst))
      .withColumn("cov",
        col("last") + lit(L - 1) -
          greatest(col("first"),
            coalesce(col("prev_last"), col("first") - L) + L) + 1)
    val perDoc = covered.groupBy(col("doc_id"))
      .agg(sum(col("n_starts")).cast("long").as("n_dup_starts"),
        count(lit(1)).cast("long").as("n_spans"),
        max(col("last") - col("first") + L).cast("long").as("max_span_tokens"),
        sum(col("cov")).cast("long").as("n_dup_tokens"))
    val base = docs.select(col("doc_id"),
      size(col("toks")).cast("long").as("n_toks"),
      greatest(size(col("toks")) - (L - 1), lit(0)).cast("long").as("n_grams"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"), col("n_grams"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        (coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
          col("n_toks").cast("double")).as("dup_ratio"))
  }

  def substrDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Materialize.lazyCut(docsToks(s, dir))
    report(docs, dupStartsGram(docs))
  }

  /** CLEANED-CORPUS REBUILD — the second half of the Lee et al. pipeline:
    * every duplicated L-gram span keeps exactly ONE canonical occurrence
    * corpus-wide (the smallest (doc_id, pos) of its gram — deterministic,
    * so both engines agree bit-for-bit) and every other occurrence's
    * tokens are removed; the doc's text rebuilds from the kept tokens.
    *
    * Scale shape: canonicality is one count+row_number over the SAME
    * gram-hash shuffle [[dupStartsGram]] already pays; removal positions
    * explode only NON-CANONICAL duplicated starts (×L, a corpus fraction);
    * the kept-token anti-join and the per-doc rebuild are key-partitioned
    * shuffles of O(total tokens) — no all-pairs, no driver data. */
  def substrClean(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Materialize.lazyCut(docsToks(s, dir))
    val grams = docs.selectExpr("doc_id",
      s"IF(size(toks) < $L, array(), transform(sequence(1, size(toks) - ${L - 1}), " +
        s"i -> unhex(md5(concat_ws(' ', slice(toks, i, $L)))))) AS gh") // 16-byte key
      .select(col("doc_id"), posexplode(col("gh")).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    val byH = Window.partitionBy(col("h"))
    val byHOrd = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val nonCanonical = grams
      .withColumn("c", count(lit(1)).over(byH))
      .withColumn("rn", row_number().over(byHOrd))
      .filter(col("c") >= 2 && col("rn") > 1)
    // Rebuild at DOC grain (round 19, verdict item 4): fold each doc's
    // removed positions into ONE deduped array and drop the removed tokens
    // with an indexed higher-order filter over the doc's own token array.
    // The r18 shape exploded EVERY corpus token into a token-grain
    // anti-join — three O(total tokens) exchanges (removed-distinct, both
    // anti-join sides) plus a collect_list/array_sort re-assembly — to
    // remove a corpus FRACTION of positions. Per-doc arrays are bounded by
    // doc length (the same bound the collect_list already assumed), the
    // groupBy ships one array per (doc × removal run), and the filter
    // lambda is per-doc-row work; position semantics are identical
    // (1-based, array_contains over the deduped removal set).
    val removedPerDoc = nonCanonical
      .select(col("doc_id"), expr(s"sequence(pos, pos + ${L - 1})").as("rs"))
      .groupBy("doc_id")
      .agg(array_distinct(flatten(collect_list(col("rs")))).as("removed"))
    docs.join(removedPerDoc, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        "IF(removed IS NULL, toks, filter(toks, (t, i) -> NOT array_contains(removed, i + 1)))"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        concat_ws(" ", col("kept")).as("clean_text"))
  }

  private val cleanOracle: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sp AS (SELECT doc_id, len(toks) AS n_toks,
       |              list_transform(range(1, greatest(len(toks) - ${L - 2}, 1)),
       |                i -> struct_pack(pos := i,
       |                  gram := array_to_string(toks[i:i+${L - 1}], ' '))) AS gs
       |       FROM tok),
       |u AS (SELECT doc_id, unnest(gs) AS e FROM sp),
       |g AS (SELECT doc_id, e.pos AS pos, e.gram AS gram FROM u),
       |m AS (SELECT doc_id, pos,
       |             count(*) OVER (PARTITION BY gram) AS c,
       |             row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |      FROM g),
       |nc AS (SELECT doc_id, pos FROM m WHERE c >= 2 AND rn > 1),
       |rem AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + $L)) AS rpos FROM nc),
       |tk0 AS (SELECT doc_id, list_transform(range(1, len(toks) + 1),
       |               i -> struct_pack(tpos := i, tok := toks[i])) AS ts FROM tok),
       |tku AS (SELECT doc_id, unnest(ts) AS e FROM tk0),
       |tk AS (SELECT doc_id, e.tpos AS tpos, e.tok AS tok FROM tku),
       |kept AS (SELECT t.doc_id, t.tpos, t.tok FROM tk t
       |         WHERE NOT EXISTS (SELECT 1 FROM rem r
       |                           WHERE r.doc_id = t.doc_id AND r.rpos = t.tpos)),
       |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |               string_agg(tok, ' ' ORDER BY tpos) AS clean_text
       |        FROM kept GROUP BY doc_id)
       |SELECT sp.doc_id, CAST(sp.n_toks AS BIGINT) AS n_toks,
       |       COALESCE(reb.n_kept, 0) AS n_kept,
       |       CAST(sp.n_toks AS BIGINT) - COALESCE(reb.n_kept, 0) AS n_removed,
       |       COALESCE(reb.clean_text, '') AS clean_text
       |FROM sp LEFT JOIN reb ON sp.doc_id = reb.doc_id
       |""".stripMargin

  def substrDedupSA(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Materialize.lazyCut(docsToks(s, dir))
    report(docs, dupStartsSA(docs))
  }

  /** Both engines share this DuckDB replay: if either diverges from the
    * window reconstruction — or from the other — the hash compare fails. */
  private val substrOracle: String =
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sp AS (SELECT doc_id, len(toks) AS n_toks,
       |              list_transform(range(1, greatest(len(toks) - ${L - 2}, 1)),
       |                i -> struct_pack(pos := i,
       |                  gram := array_to_string(toks[i:i+${L - 1}], ' '))) AS gs
       |       FROM tok),
       |u AS (SELECT doc_id, unnest(gs) AS e FROM sp),
       |g AS (SELECT doc_id, e.pos AS pos, e.gram AS gram FROM u),
       |d AS (SELECT doc_id, pos FROM
       |        (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c FROM g)
       |      WHERE c >= 2),
       |r AS (SELECT doc_id, pos,
       |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |      FROM d),
       |runs AS (SELECT doc_id, min(pos) AS first, max(pos) AS last,
       |                count(*) AS n_starts
       |         FROM r GROUP BY doc_id, grp),
       |cov AS (SELECT doc_id, first, last, n_starts,
       |               last + ${L - 1} - greatest(first,
       |                 COALESCE(lag(last) OVER (PARTITION BY doc_id ORDER BY first),
       |                          first - $L) + $L) + 1 AS cv
       |        FROM runs),
       |rep AS (SELECT doc_id, CAST(sum(n_starts) AS BIGINT) AS n_dup_starts,
       |               CAST(count(*) AS BIGINT) AS n_spans,
       |               CAST(max(last - first + $L) AS BIGINT) AS max_span_tokens,
       |               CAST(sum(cv) AS BIGINT) AS n_dup_tokens
       |        FROM cov GROUP BY doc_id)
       |SELECT sp.doc_id, CAST(sp.n_toks AS BIGINT) AS n_toks,
       |       CAST(greatest(sp.n_toks - ${L - 1}, 0) AS BIGINT) AS n_grams,
       |       COALESCE(rep.n_dup_starts, 0) AS n_dup_starts,
       |       COALESCE(rep.n_spans, 0) AS n_spans,
       |       COALESCE(rep.max_span_tokens, 0) AS max_span_tokens,
       |       COALESCE(rep.n_dup_tokens, 0) AS n_dup_tokens,
       |       CAST(COALESCE(rep.n_dup_tokens, 0) AS DOUBLE) /
       |         CAST(sp.n_toks AS DOUBLE) AS dup_ratio
       |FROM sp LEFT JOIN rep ON sp.doc_id = rep.doc_id
       |""".stripMargin

  /** AGREEMENT report: the exact variable-length method vs the fixed
    * 8-token window approximation (`q_span_dedup`), per flagged-doc
    * confusion counts — the number the window method's users need before
    * trusting it at scale (docs the cheap pass would pass through that
    * the exact pass flags, and vice versa). Integer-only output: exact
    * across engines. */
  // The exact-dup flag relation is the expensive half of the agreement
  // report and is pure per (session, dir) — publish it once through the
  // artifact registry (pinned: lineage-truncated, shared by every
  // consumer) instead of re-running the gram pass per call.
  private val exactFlagsReg =
    scala.collection.concurrent.TrieMap.empty[graft.Artifacts.Key, DataFrame]
  private def exactFlags(s: SparkSession, dir: String): DataFrame =
    graft.Artifacts.cached(exactFlagsReg, s, dir)(
      graft.Materialize.eager(
        substrDedup(s, dir)
          .select(col("doc_id"), (col("n_dup_tokens") > 0).as("exact_dup")),
        pin = true))

  def substrAgreement(s: SparkSession, dir: String): DataFrame = {
    val exact = exactFlags(s, dir)
    val window = Dedup.spanDedup(s, dir)
      .select(col("doc_id"), (col("n_dup_spans") > 0).as("win_dup"))
    exact.join(window, "doc_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("exact_dup") && col("win_dup"), 1L).otherwise(0L))
          .cast("long").as("both"),
        sum(when(col("exact_dup") && !col("win_dup"), 1L).otherwise(0L))
          .cast("long").as("exact_only"),
        sum(when(!col("exact_dup") && col("win_dup"), 1L).otherwise(0L))
          .cast("long").as("window_only"),
        sum(when(!col("exact_dup") && !col("win_dup"), 1L).otherwise(0L))
          .cast("long").as("neither"))
  }
  private val agreementOracle: String = {
    // the window method's flag, reconstructed like spanDedupSql
    val winFlag =
      """wtok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |         FROM documents),
        |wsp AS (SELECT doc_id,
        |               list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
        |                 i -> array_to_string(toks[i:i+7], ' '))) AS spans FROM wtok),
        |wex AS (SELECT doc_id, unnest(spans) AS span FROM wsp),
        |ww AS (SELECT doc_id, count(*) OVER (PARTITION BY span) AS df FROM wex),
        |wdup AS (SELECT DISTINCT doc_id FROM ww WHERE df >= 2)""".stripMargin
    s"""WITH tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |sp AS (SELECT doc_id,
       |              list_transform(range(1, greatest(len(toks) - ${L - 2}, 1)),
       |                i -> array_to_string(toks[i:i+${L - 1}], ' ')) AS gs
       |       FROM tok),
       |g AS (SELECT doc_id, unnest(gs) AS gram FROM sp),
       |w AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM g),
       |edup AS (SELECT DISTINCT doc_id FROM w WHERE df >= 2),
       |$winFlag,
       |flags AS (SELECT tok.doc_id,
       |                 tok.doc_id IN (SELECT doc_id FROM edup) AS exact_dup,
       |                 tok.doc_id IN (SELECT doc_id FROM wdup) AS win_dup
       |          FROM tok)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(*) FILTER (WHERE exact_dup AND win_dup) AS BIGINT) AS both,
       |       CAST(count(*) FILTER (WHERE exact_dup AND NOT win_dup) AS BIGINT) AS exact_only,
       |       CAST(count(*) FILTER (WHERE NOT exact_dup AND win_dup) AS BIGINT) AS window_only,
       |       CAST(count(*) FILTER (WHERE NOT exact_dup AND NOT win_dup) AS BIGINT) AS neither
       |FROM flags
       |""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // TOKEN-ID-SPACE substring dedup — what Lee et al. actually run: the
  // corpus re-tokenized by the LEARNED BPE tokenizer (q_bpe_train's merge
  // table) before the duplicated-span scan, so duplicates that differ only
  // in whitespace/segmentation still align, and the gram width halves in
  // symbol units. Composition, not new machinery: the doc's token stream
  // joins on a word-boundary symbol (0x1E — below every token byte, never
  // inside a trained pair, so a whole-string `replace` chain equals the
  // per-token greedy apply bit for bit), the 6 learned merges apply as
  // chained replaces (each merged pair becomes one private-codepoint
  // char), and the SAME gram-hash → count ≥ 2 → gaps-and-islands rollup
  // runs over SYMBOL positions. One O(total symbols) shuffle, bounded
  // per-doc windows — the whitespace engine's scale shape unchanged.
  // ---------------------------------------------------------------------------
  private val Lb = 30 // threshold in BPE symbols (≈ half the char width of L=15 tokens)

  private def symDocs(s: SparkSession, dir: String): DataFrame = {
    val env = TextAnalysis.bpeEnv(s, dir) // one-row broadcast: m1..mR, codepoint space
    val applied = (1 to TextAnalysis.BpeRounds)
      .foldLeft(s"concat_ws('${30.toChar}', toks)") { (acc, k) =>
        s"replace($acc, m$k, '${(256 + k).toChar}')"
      }
    graft.Materialize.lazyCut(
      docsToks(s, dir).crossJoin(broadcast(env))
        .selectExpr("doc_id", s"$applied AS sym"))
  }

  def substrBpe(s: SparkSession, dir: String): DataFrame = {
    val docs = symDocs(s, dir)
    val grams = docs.selectExpr("doc_id",
      s"IF(length(sym) < $Lb, array(), transform(sequence(1, length(sym) - ${Lb - 1}), " +
        s"i -> unhex(md5(cast(substring(sym, i, $Lb) as binary))))) AS gh") // 16-byte key
      .select(col("doc_id"), posexplode(col("gh")).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    val dup = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("c") >= 2).select("doc_id", "pos")
    // gaps-and-islands in symbol space (the report() rollup at width Lb)
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = dup
      .withColumn("grp", col("pos") - row_number().over(byPos))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("first"), max(col("pos")).as("last"),
        count(lit(1)).as("n_starts"))
    val byFirst = Window.partitionBy(col("doc_id")).orderBy(col("first"))
    val covered = runs
      .withColumn("prev_last", lag(col("last"), 1).over(byFirst))
      .withColumn("cov",
        col("last") + lit(Lb - 1) -
          greatest(col("first"),
            coalesce(col("prev_last"), col("first") - Lb) + Lb) + 1)
    val perDoc = covered.groupBy(col("doc_id"))
      .agg(sum(col("n_starts")).cast("long").as("n_dup_starts"),
        count(lit(1)).cast("long").as("n_spans"),
        max(col("last") - col("first") + Lb).cast("long").as("max_span_syms"),
        sum(col("cov")).cast("long").as("n_dup_syms"))
    docs.select(col("doc_id"), length(col("sym")).cast("long").as("n_syms"),
      greatest(length(col("sym")) - (Lb - 1), lit(0)).cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_syms"), col("n_grams"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span_syms"), lit(0L)).as("max_span_syms"),
        coalesce(col("n_dup_syms"), lit(0L)).as("n_dup_syms"),
        (coalesce(col("n_dup_syms"), lit(0L)).cast("double") /
          col("n_syms").cast("double")).as("dup_ratio"))
  }

  /** The oracle's symbol relation: the trained-merge CTE chain (shared
    * with q_bpe_train's oracle) + the same whole-string replace chain. */
  private def symDuck: String = {
    val applied = (1 to TextAnalysis.BpeRounds)
      .foldLeft(s"array_to_string(toks, '${30.toChar}')") { (acc, k) =>
        s"replace($acc, (SELECT pair FROM m$k), '${(256 + k).toChar}')"
      }
    s"""${TextAnalysis.bpeRoundsSql},
       |tok AS (SELECT doc_id, $toksDuck AS toks FROM documents),
       |app AS (SELECT doc_id, $applied AS sym FROM tok)""".stripMargin
  }

  private val bpeOracle: String =
    s"""WITH $symDuck,
       |sp AS (SELECT doc_id, length(sym) AS n_syms,
       |              list_transform(range(1, greatest(length(sym) - ${Lb - 2}, 1)),
       |                i -> struct_pack(pos := i,
       |                  gram := substring(sym, CAST(i AS INT), $Lb))) AS gs
       |       FROM app),
       |u AS (SELECT doc_id, unnest(gs) AS e FROM sp),
       |g AS (SELECT doc_id, e.pos AS pos, e.gram AS gram FROM u),
       |d AS (SELECT doc_id, pos FROM
       |        (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c FROM g)
       |      WHERE c >= 2),
       |r AS (SELECT doc_id, pos,
       |             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |      FROM d),
       |runs AS (SELECT doc_id, min(pos) AS first, max(pos) AS last,
       |                count(*) AS n_starts
       |         FROM r GROUP BY doc_id, grp),
       |cov AS (SELECT doc_id, first, last, n_starts,
       |               last + ${Lb - 1} - greatest(first,
       |                 COALESCE(lag(last) OVER (PARTITION BY doc_id ORDER BY first),
       |                          first - $Lb) + $Lb) + 1 AS cv
       |        FROM runs),
       |rep AS (SELECT doc_id, CAST(sum(n_starts) AS BIGINT) AS n_dup_starts,
       |               CAST(count(*) AS BIGINT) AS n_spans,
       |               CAST(max(last - first + $Lb) AS BIGINT) AS max_span_syms,
       |               CAST(sum(cv) AS BIGINT) AS n_dup_syms
       |        FROM cov GROUP BY doc_id)
       |SELECT sp.doc_id, CAST(sp.n_syms AS BIGINT) AS n_syms,
       |       CAST(greatest(sp.n_syms - ${Lb - 1}, 0) AS BIGINT) AS n_grams,
       |       COALESCE(rep.n_dup_starts, 0) AS n_dup_starts,
       |       COALESCE(rep.n_spans, 0) AS n_spans,
       |       COALESCE(rep.max_span_syms, 0) AS max_span_syms,
       |       COALESCE(rep.n_dup_syms, 0) AS n_dup_syms,
       |       CAST(COALESCE(rep.n_dup_syms, 0) AS DOUBLE) /
       |         CAST(sp.n_syms AS DOUBLE) AS dup_ratio
       |FROM sp LEFT JOIN rep ON sp.doc_id = rep.doc_id
       |""".stripMargin

  /** AGREEMENT: whitespace-token-space vs BPE-symbol-space duplicate
    * flags, per-doc confusion counts — what switching the dedup pass to
    * tokenizer space changes. Integer-only: exact across engines. */
  def substrAgreementBpe(s: SparkSession, dir: String): DataFrame = {
    val ws = exactFlags(s, dir) // pinned artifact, shared with q_substr_agree
    val bpe = substrBpe(s, dir)
      .select(col("doc_id"), (col("n_dup_syms") > 0).as("bpe_dup"))
    ws.join(bpe, "doc_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("exact_dup") && col("bpe_dup"), 1L).otherwise(0L))
          .cast("long").as("both"),
        sum(when(col("exact_dup") && !col("bpe_dup"), 1L).otherwise(0L))
          .cast("long").as("ws_only"),
        sum(when(!col("exact_dup") && col("bpe_dup"), 1L).otherwise(0L))
          .cast("long").as("bpe_only"),
        sum(when(!col("exact_dup") && !col("bpe_dup"), 1L).otherwise(0L))
          .cast("long").as("neither"))
  }
  private val agreementBpeOracle: String =
    s"""WITH $symDuck,
       |wsp AS (SELECT doc_id,
       |               list_transform(range(1, greatest(len(toks) - ${L - 2}, 1)),
       |                 i -> array_to_string(toks[i:i+${L - 1}], ' ')) AS gs
       |        FROM tok),
       |wg AS (SELECT doc_id, unnest(gs) AS gram FROM wsp),
       |ww AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM wg),
       |wdup AS (SELECT DISTINCT doc_id FROM ww WHERE df >= 2),
       |bg AS (SELECT doc_id,
       |              unnest(list_transform(range(1, greatest(length(sym) - ${Lb - 2}, 1)),
       |                i -> substring(sym, CAST(i AS INT), $Lb))) AS gram
       |       FROM app),
       |bw AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM bg),
       |bdup AS (SELECT DISTINCT doc_id FROM bw WHERE df >= 2),
       |flags AS (SELECT tok.doc_id,
       |                 tok.doc_id IN (SELECT doc_id FROM wdup) AS ws_dup,
       |                 tok.doc_id IN (SELECT doc_id FROM bdup) AS bpe_dup
       |          FROM tok)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(*) FILTER (WHERE ws_dup AND bpe_dup) AS BIGINT) AS both,
       |       CAST(count(*) FILTER (WHERE ws_dup AND NOT bpe_dup) AS BIGINT) AS ws_only,
       |       CAST(count(*) FILTER (WHERE NOT ws_dup AND bpe_dup) AS BIGINT) AS bpe_only,
       |       CAST(count(*) FILTER (WHERE NOT ws_dup AND NOT bpe_dup) AS BIGINT) AS neither
       |FROM flags
       |""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_substr_dedup" -> (substrDedup _),
    "q_substr_sa" -> (substrDedupSA _),
    "q_substr_clean" -> (substrClean _),
    "q_substr_agree" -> (substrAgreement _),
    "q_substr_bpe" -> (substrBpe _),
    "q_substr_agree_bpe" -> (substrAgreementBpe _))
  val oracleSql: Map[String, String] = Map(
    "q_substr_dedup" -> substrOracle,
    "q_substr_sa" -> substrOracle,
    "q_substr_clean" -> cleanOracle,
    "q_substr_agree" -> agreementOracle,
    "q_substr_bpe" -> bpeOracle,
    "q_substr_agree_bpe" -> agreementBpeOracle)
}
