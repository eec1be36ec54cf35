package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact → MinHash/LSH → SimHash → n-gram Jaccard →
  * embedding-cosine near-dup.
  *
  * Scale design notes (the 100 TB posture):
  *  - Exact dedup shuffles a 32-char md5 key, never the document text.
  *  - MinHash/SimHash signatures are computed in ONE pass over an
  *    exploded (doc, shingle) relation with hash-aggregations — partial
  *    (map-side) aggregation applies, so the shuffle carries one row per
  *    document, not per shingle.
  *  - Candidate generation is a self-equi-join on (band, band_hash) —
  *    a hash-partitioned join, never a cross join. Only candidate PAIRS
  *    (a vanishing fraction of n²) reach the verification stage.
  *  - Verification re-joins the candidates to the shingle sets by key —
  *    again equi-joins. Nothing in this file materializes n² rows.
  */
object Dedup {

  // -------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------

  /** Keep exactly one row (smallest `idCol`) per distinct value of
    * `fingerprint(textCol)`. Equivalent to dropDuplicates, but with a
    * deterministic keeper and a fixed-width shuffle key. Keeper choice
    * is a partial-aggregable min_by, not a rank window: a
    * mass-duplicated text (the case dedup exists for) pre-reduces on
    * every map task instead of serializing its whole group onto one. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(fingerprint(col(textCol)).as("__fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(cols.map(c => col(s"__r.`$c`").as(c)): _*)
  }

  /** Per-source exact-duplication stats (documents table shape). */
  def exactStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .groupBy(col("source"))
      .agg(
        count("*").as("n_docs"),
        count_distinct(col("fp")).as("distinct_texts"))
      .withColumn("dup_docs", col("n_docs") - col("distinct_texts"))

  // -------------------------------------------------------------------
  // MinHash + LSH
  // -------------------------------------------------------------------

  /** Distinct (id, shingle) pairs — the common input of MinHash, SimHash
    * and Jaccard verification. */
  private def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
                explode(shingles(col(textCol), n)).as("sh"))

  /** The MinHash permutation family is ENGINE-SHARED so the whole
    * LSH pipeline is value-level oracle-checkable (the x16 promotion
    * pattern): one base hash per distinct shingle — the top 60 bits of
    * md5, reduced mod the Mersenne prime p = 2^31 − 1 — then numHashes
    * affine maps h_i(g) = (a_i·g + b_i) mod p, a pairwise-independent
    * family any SQL engine can replicate with literal seeds. Products
    * stay under 2^62, so plain BIGINT arithmetic is exact on both
    * engines. One md5 per shingle + k multiply-adds is also CHEAPER
    * than k seeded string hashes.
    *
    * Accuracy note: the mod-p reduction shrinks the shingle universe
    * to Z_p (31 bits) — within a candidate pair's shingle union of
    * size u, base collisions occur w.p. ~u²/2³² and bias signature
    * similarity UPWARD for very large documents (u in the tens of
    * thousands). The 60-bit md5 value itself loses essentially
    * nothing; the reduction is what trades accuracy for exact BIGINT
    * arithmetic. Final Jaccard is verified exactly downstream, so the
    * bias only inflates candidate volume, never the output. */
  def minhashPrime: Long = 2147483647L
  def minhashSeedA(i: Int): Long = ((i * 2654435761L + 1013904223L) % (minhashPrime - 1)) + 1
  def minhashSeedB(i: Int): Long = (i * 1103515245L + 12345L) % minhashPrime

  /** MinHash signatures: numHashes independent permutations over the
    * engine-shared base hash (see [[minhashPrime]]). One shuffle:
    * groupBy(id) with numHashes `min` partial aggregates; the md5 base
    * is projected ONCE per (id, shingle) row, the k affine maps are
    * codegen'd multiply-adds inside the partial aggregation. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, numHashes: Int): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, n)
      .select(col("id"),
        (conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
          % minhashPrime).as("g"))
    val mins = (0 until numHashes).map { i =>
      min((lit(minhashSeedA(i)) * col("g") + lit(minhashSeedB(i))) % minhashPrime)
        .as(s"h$i")
    }
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: (id, band index, band key). The band key is the
    * slice's VALUES joined as a string, not a hash of the slice —
    * collision-free by construction, so candidate semantics are
    * exactly "all rows of the band equal" on any engine (a hashed
    * band key would admit ~2^-64 spurious candidates the oracle
    * cannot reproduce). */
  private def banded(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("array<string>"))
      }: _*)).as(Seq("band", "bh")))

  /** Candidate near-duplicate pairs from banded MinHash signatures,
    * verified with EXACT shingle-set Jaccard, filtered at `threshold`.
    *
    * Output: (id_a, id_b, jaccard), id_a < id_b.
    *
    * Parameter rationale (the 100 TB posture): unigram shingles collide
    * on shared vocabulary and degenerate the band-join toward all-pairs —
    * word TRIGRAMS are the default shingle unit. 32 hashes in 8 bands × 4
    * rows puts the LSH S-curve's 50% collision point at (1/8)^(1/4) ≈ 0.59
    * — high recall at threshold 0.9 with few spurious candidates. Buckets
    * larger than `maxBucketSize` (mass exact/near-exact duplicates or
    * degenerate content) are excluded from PAIR GENERATION — a bucket of
    * size m contributes m² candidate pairs, so one pathological bucket
    * can dominate the whole job; such content is better handled by exact
    * dedup first. The shingle relation is NOT cached: it is a row-local
    * scan+explode recomputed cheaper than it could be stored. */
  def minhashNearDups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.9, maxBucketSize: Int = 200): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val bd = banded(sigs, bands, rowsPerBand)

    // bucket-size suppression via a window count rather than groupBy+join:
    // Spark plans are trees, not DAGs — every reference to `bd` re-executes
    // the whole signature pipeline, so keeping the filter to ONE reference
    // (instead of join's two) saves a full signature computation.
    val pruned = bd
      .withColumn("__bsz", count("*").over(
        Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
      .localCheckpoint()
    val cands = pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
      .localCheckpoint()

    // Verification re-shingles ONLY the documents that appear in a
    // candidate pair (semi-join on the checkpointed candidate ids) — at
    // corpus scale candidates are a vanishing fraction of n, so the
    // verify stage never touches the full text again. The materialized
    // relations here (signatures, banded ids, candidate pairs, candidate
    // shingles) are all O(docs) or O(candidates) — the full shingle
    // relation is streamed through one aggregation and never stored.
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id")))
      .distinct()
    val candDocs = docs.join(candIds, docs(idCol) === candIds("id"), "left_semi")
    val sh = shingleSet(candDocs, idCol, textCol, n).localCheckpoint()

    verifyJaccard(cands, sh, threshold)
  }

  /** Exact Jaccard for candidate pairs given the (id, shingle) relation:
    * |A∩B| via equi-join restricted to candidates, |A∪B| = |A|+|B|−|A∩B|. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count("*").as("sz"))
    val inter = cands
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count("*").as("inter"))
    cands
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.as("za"), col("id_a") === col("za.id"))
      .join(sizes.as("zb"), col("id_b") === col("zb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** 64-bit SimHash over the token multiset: bit j of the signature is
    * the sign of Σ_occurrences (±1 from bit j of the token's base hash).
    * Summing ±1 per OCCURRENCE is identical to summing ±count per
    * distinct token, so no (id, token) pre-aggregation exists — one
    * shuffle total, with the 64 conditional sums partially aggregated
    * map-side.
    *
    * The base hash is ENGINE-SHARED (the x06/x16 family): the first 16
    * hex chars of md5, carried as TWO 32-bit halves `(sh_hi, sh_lo)` —
    * a single signed 64-bit value would make the j=63 term `1<<63`
    * negative on the JVM and unrepresentable in engines whose BIGINT
    * cast rejects values over 2^63−1, while each half stays in
    * [0, 2^32) where every engine's integer semantics agree. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("m", md5(col("t")))
      .select(col("id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hhi"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("hlo"))
    val bitSums = (0 until 64).map { j =>
      val half = if (j < 32) col("hlo") else col("hhi")
      sum(when(shiftright(half, j % 32).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$j")
    }
    val agg = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    def half(lowBit: Int): Column = (0 until 32).map { j =>
      when(col(s"b${lowBit + j}") > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }.reduce[Column](_.bitwiseOR(_))
    agg.select(col("id"), half(32).as("sh_hi"), half(0).as("sh_lo"))
  }

  /** Near-dup pairs by SimHash: candidates share at least one of EIGHT
    * 8-bit chunks — by pigeonhole, any pair with hamming distance ≤ 7 has
    * all differing bits spread over ≤ 7 chunks, so at least one chunk is
    * equal: recall is guaranteed (exactly 1.0) for maxHamming ≤ 7 among
    * pairs whose shared chunk lies in an unsaturated bucket.
    * Verified with exact popcount of the XOR (see DedupSpec recall test).
    *
    * `maxBucketSize` is the x06 suppression, and it is LOAD-BEARING
    * here: the banding key space is only 8 chunks × 256 values = 2048
    * buckets, so candidate volume has an n²/2048 floor even for uniform
    * signatures — and real signatures are far from uniform (common
    * tokens swing the same bit sums across documents; measured on the
    * v3 fixture at sf0.1: 4.06M candidates from 5,000 docs = 32% of ALL
    * pairs, growing 124× at 30× data). A bucket of size m contributes
    * m² pairs; capping bounds total candidates at 2048·cap² regardless
    * of corpus size. Mass near-identical content inside saturated
    * buckets is the exact-dedup-first / minhash regime — same
    * documented trade as [[minhashNearDups]]. */
  def simhashNearDups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                      maxHamming: Int = 7, maxBucketSize: Int = 200): DataFrame = {
    require(maxHamming <= 7, s"8-chunk banding guarantees recall only for hamming <= 7, got $maxHamming")
    val sig = simhashSignatures(docs, idCol, textCol)
    // materialized once: both self-join sides would otherwise re-run the
    // 64-column signature aggregation
    val chunks = sig.select(col("id"), col("sh_hi"), col("sh_lo"), posexplode(
      array((0 until 8).map { c =>
        val half = if (c < 4) col("sh_lo") else col("sh_hi")
        shiftright(half, (c % 4) * 8).bitwiseAND(0xFFL)
      }: _*)).as(Seq("chunk", "ch")))
      .withColumn("__bsz", count("*").over(
        Window.partitionBy(col("chunk"), col("ch"))))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
      .localCheckpoint()
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ch") === col("y.ch") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
              col("x.sh_hi").as("ha"), col("x.sh_lo").as("la"),
              col("y.sh_hi").as("hb"), col("y.sh_lo").as("lb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // -------------------------------------------------------------------
  // n-gram Jaccard (top-k most similar pairs)
  // -------------------------------------------------------------------

  /** Exact word-n-gram Jaccard for every pair sharing ≥1 shingle — the
    * shingle equi-join IS the blocking; zero-overlap pairs never
    * materialize. Shared core of [[ngramJaccardTopK]] and
    * [[ngramJaccardPairs]]. */
  private def ngramJaccardAll(docs: DataFrame, idCol: String, textCol: String,
                              n: Int): DataFrame = {
    // Plans are trees, not DAGs: `sh` feeds both self-join sides and the
    // size relation, so the shingle explode runs once per reference —
    // and that is the RIGHT trade: the relation is corpus-sized, so
    // storing it (localCheckpoint) costs block-manager memory + GC at
    // 100 TB scale, while the re-run is a row-local scan+explode through
    // the codegen'd word_shingles kernel (re-measured at sf0.1: the
    // checkpoint no longer wins once the kernel replaced the HOF path).
    def sh = shingleSet(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col("id")).agg(count("*").as("sz"))
    val inter = sh.as("sa").join(sh.as("sb"),
        col("sa.sh") === col("sb.sh") && col("sa.id") < col("sb.id"))
      .groupBy(col("sa.id").as("id_a"), col("sb.id").as("id_b"))
      .agg(count("*").as("inter"))
    inter
      .join(sizes.as("za"), col("id_a") === col("za.id"))
      .join(sizes.as("zb"), col("id_b") === col("zb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter"))).as("jaccard"))
  }

  /** Top-k most similar pairs by exact n-gram Jaccard. */
  def ngramJaccardTopK(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                       n: Int = 3, k: Int = 50): DataFrame =
    ngramJaccardAll(docs, idCol, textCol, n)
      .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
      .limit(k)

  /** Every pair at or above an exact-Jaccard threshold — the
    * deterministic near-dup EDGE LIST, i.e. the input of
    * [[Components.connectedComponents]] for dedup-group resolution. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 3, threshold: Double = 0.5): DataFrame =
    ngramJaccardAll(docs, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)

  /** Near-dup pairs with a DOCUMENT-FREQUENCY CAP on candidate
    * generation — the corpus-scale-safe variant of
    * [[ngramJaccardPairs]]. The uncapped shingle self-join is exact but
    * quadratic in shingle document frequency: a boilerplate shingle
    * present in m documents ("all rights reserved", navigation chrome,
    * license headers) contributes m²/2 joined rows, and at corpus scale
    * m reaches millions — measured concretely by `graft.ScaleCheck`,
    * where welding 10-member families into shared-shingle cliques blew
    * the uncapped join up 90× in shuffle volume for 10× the data.
    *
    * Here candidate pairs come only from shingles whose corpus document
    * frequency is ≤ `maxDf` (one extra vocabulary-sized aggregation —
    * partial-agg'd, shuffles only the shingle vocabulary), so one
    * shingle contributes at most maxDf²/2 candidates no matter how
    * pathological the corpus. Verification then recomputes EXACT
    * Jaccard over the candidates' FULL shingle sets (capped shingles
    * included), so every reported (pair, jaccard) is exact. The one
    * semantic difference from the uncapped operator, stated rather than
    * hidden: a pair whose shared shingles ALL have df > maxDf is never
    * considered — at a sane cap such a pair shares only boilerplate,
    * which is segment-dedup's job (x43), not near-dup's. */
  def ngramJaccardPairsCapped(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", n: Int = 3,
                              threshold: Double = 0.5,
                              maxDf: Int = 100): DataFrame = {
    val cands = cappedCandidates(docs, idCol, textCol, n, maxDf)
      .localCheckpoint() // candidate set is the small relation; cut the
                         // double-scan lineage before the verify joins
    // Verification re-shingles ONLY documents that appear in a candidate
    // pair (semi-join, as in minhashNearDups) but over their FULL shingle
    // sets — capped shingles included — so every reported jaccard is
    // exact. Candidates are a vanishing fraction of the corpus, so the
    // O(candidates) checkpoint is cheap and verify never rescans the
    // full text.
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id")))
      .distinct()
    val candDocs = docs.join(candIds, docs(idCol) === candIds("id"), "left_semi")
    val candSh = shingleSet(candDocs, idCol, textCol, n).localCheckpoint()
    verifyJaccard(cands, candSh, threshold)
  }

  /** ASYMMETRIC containment pairs with df-capped candidates — the
    * "is document A (mostly) contained IN document B" detector that
    * Jaccard structurally cannot express: a 40-shingle quote embedded
    * in a 4000-shingle article has containment(A→B) = 1.0 but Jaccard
    * ≈ 0.01, so a Jaccard threshold that catches it would drown in
    * noise. Containment is the signal behind quote/subset dedup
    * ("drop the snippet, keep the article") and behind detecting
    * benchmark questions pasted verbatim into larger pages.
    *
    * Definition: C(a→b) = |Sa ∩ Sb| / |Sa| over the distinct word
    * n-gram sets. The output carries BOTH directions
    * (`cont_a_in_b` = inter/|Sa|, `cont_b_in_a` = inter/|Sb|) for each
    * unordered pair with `max(C) ≥ threshold`, so the caller decides
    * which side is the subset.
    *
    * Scale shape — identical to [[ngramJaccardPairsCapped]], with which
    * it shares the candidate generator verbatim: candidates come only
    * from shingles with corpus df ≤ `maxDf` (bounded at maxDf²/2 rows
    * per shingle on any corpus), then EXACT intersection and set sizes
    * are recomputed over the candidates' FULL shingle sets via a
    * semi-join re-shingle of only the candidate documents. Same stated
    * cap semantics: a pair whose shared shingles are ALL boilerplate
    * (df > maxDf) is never considered. */
  def ngramContainmentPairsCapped(docs: DataFrame, idCol: String = "doc_id",
                                  textCol: String = "text", n: Int = 3,
                                  threshold: Double = 0.8,
                                  maxDf: Int = 100): DataFrame = {
    val cands = cappedCandidates(docs, idCol, textCol, n, maxDf)
      .localCheckpoint() // same small-relation trade as the Jaccard twin
    val candIds = cands.select(col("id_a").as("id"))
      .union(cands.select(col("id_b").as("id")))
      .distinct()
    val candDocs = docs.join(candIds, docs(idCol) === candIds("id"), "left_semi")
    val candSh = shingleSet(candDocs, idCol, textCol, n).localCheckpoint()
    val sizes = candSh.groupBy(col("id")).agg(count("*").as("sz"))
    val inter = cands
      .join(candSh.as("sa"), col("id_a") === col("sa.id"))
      .join(candSh.as("sb"), col("id_b") === col("sb.id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count("*").as("inter"))
    cands
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.as("za"), col("id_a") === col("za.id"))
      .join(sizes.as("zb"), col("id_b") === col("zb.id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("za.sz")).as("cont_a_in_b"),
        (col("inter").cast("double") / col("zb.sz")).as("cont_b_in_a"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
  }

  /** The df-capped candidate stage of [[ngramJaccardPairsCapped]],
    * pre-checkpoint — exposed for plan-shape guards. The df cap is a
    * window count rather than groupBy+join — the same one-reference
    * trick as [[minhashNearDups]]: plans are trees, so the join
    * formulation's two `blocked` references each re-ran BOTH the
    * corpus-sized shingle explode and the df aggregation (4 shingle
    * scans in candidate generation); one window reference per join side
    * halves that, with the same single hash-shuffle on `sh`. */
  private[graft] def cappedCandidates(docs: DataFrame, idCol: String,
                                      textCol: String, n: Int,
                                      maxDf: Int): DataFrame = {
    val blocked = shingleSet(docs, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")
    blocked.as("sa").join(blocked.as("sb"),
        col("sa.sh") === col("sb.sh") && col("sa.id") < col("sb.id"))
      .select(col("sa.id").as("id_a"), col("sb.id").as("id_b"))
      .distinct()
  }

  /** Top-k most similar pairs with DF-CAPPED candidate generation — the
    * corpus-scale variant of [[ngramJaccardTopK]], which shares the
    * uncapped blocking join's boilerplate pathology (a df-m shingle
    * contributes m²/2 candidate rows before the sort). Candidates come
    * only from shingles with df ≤ `maxDf`; ranked similarity is then
    * EXACT over the candidates' full shingle sets, and the global top-k
    * plans as TakeOrdered (distributed heap), never a one-partition
    * sort. Pairs sharing only above-cap shingles are never ranked —
    * same stated semantics as [[ngramJaccardPairsCapped]]. */
  def ngramJaccardTopKCapped(docs: DataFrame, idCol: String = "doc_id",
                             textCol: String = "text", n: Int = 3,
                             k: Int = 50, maxDf: Int = 100): DataFrame =
    ngramJaccardPairsCapped(docs, idCol, textCol, n, threshold = 0.0, maxDf)
      .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
      .limit(k)

  /** CROSS-corpus near-dup pairs: every (incoming, reference) pair at or
    * above an exact n-gram-Jaccard threshold — the "dedup the new crawl
    * against the existing training set" / "is this eval doc already in
    * the corpus" operator. Same blocking as [[ngramJaccardPairs]] (the
    * shingle equi-join IS the candidate generator; zero-overlap pairs
    * never materialize) but between two corpora, so there is no
    * self-join and no a<b asymmetry. The incoming side is typically a
    * small fraction of the reference — only shingles occurring on BOTH
    * sides survive the join, so the reference corpus is never expanded
    * beyond its matching shingles.
    *
    * Output: (id_in, id_ref, jaccard). */
  def ngramJaccardCross(incoming: DataFrame, reference: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // shingle relations are CORPUS-sized — never stored. Each side's size
    // aggregate re-runs the row-local scan+explode (cheap with the
    // codegen'd kernel) instead of materializing the explode.
    def shIn = shingleSet(incoming, idCol, textCol, n)
    def shRef = shingleSet(reference, idCol, textCol, n)
    val szIn = shIn.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val szRef = shRef.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    shIn.as("a").join(shRef.as("b"), col("a.sh") === col("b.sh"))
      .groupBy(col("a.id").as("id_in"), col("b.id").as("id_ref"))
      .agg(count(lit(1)).as("inter"))
      .join(szIn.as("za"), col("id_in") === col("za.id"))
      .join(szRef.as("zb"), col("id_ref") === col("zb.id"))
      .select(col("id_in"), col("id_ref"),
        (col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** CROSS-corpus near-dup with DF-CAPPED candidate generation — the
    * corpus-scale variant of [[ngramJaccardCross]]. The uncapped
    * cross-join blocking pays df_in(sh)·df_ref(sh) rows per shared
    * shingle, and boilerplate shared ACROSS corpora (the same license
    * headers exist in every crawl) makes that product explode exactly
    * like the self-join case. Candidates here come only from shingles
    * rare on BOTH sides (df ≤ `maxDf` within each corpus separately),
    * bounding the per-shingle join cost at maxDf²; similarity is then
    * EXACT over the candidate documents' FULL shingle sets. Stated
    * semantic difference: a pair whose shared shingles are all above-cap
    * on either side is never considered — at a sane cap that overlap is
    * boilerplate (segment-dedup's job), not duplication. */
  def ngramJaccardCrossCapped(incoming: DataFrame, reference: DataFrame,
                              idCol: String = "doc_id", textCol: String = "text",
                              n: Int = 3, threshold: Double = 0.5,
                              maxDf: Int = 100): DataFrame = {
    // per-side df cap via ONE window reference per side (the
    // minhashNearDups trick) — no second scan for a df aggregation
    def capped(side: DataFrame) = shingleSet(side, idCol, textCol, n)
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")
    val cands = capped(incoming).as("a").join(capped(reference).as("b"),
        col("a.sh") === col("b.sh"))
      .select(col("a.id").as("id_in"), col("b.id").as("id_ref"))
      .distinct()
      .localCheckpoint()

    // exact verification over candidate documents only (each side
    // semi-joined to its candidate ids), full shingle sets included
    val inDocs = incoming.join(
      cands.select(col("id_in").as("id")).distinct(),
      incoming(idCol) === col("id"), "left_semi")
    val refDocs = reference.join(
      cands.select(col("id_ref").as("id")).distinct(),
      reference(idCol) === col("id"), "left_semi")
    val shIn = shingleSet(inDocs, idCol, textCol, n).localCheckpoint()
    val shRef = shingleSet(refDocs, idCol, textCol, n).localCheckpoint()
    val szIn = shIn.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val szRef = shRef.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = cands
      .join(shIn.as("sa"), col("id_in") === col("sa.id"))
      .join(shRef.as("sb"),
        col("id_ref") === col("sb.id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("id_in"), col("id_ref"))
      .agg(count(lit(1)).as("inter"))
    cands
      .join(inter, Seq("id_in", "id_ref"), "left")
      .na.fill(0L, Seq("inter"))
      .join(szIn.as("za"), col("id_in") === col("za.id"))
      .join(szRef.as("zb"), col("id_ref") === col("zb.id"))
      .select(col("id_in"), col("id_ref"),
        (col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------------
  // Bloom-filter membership pre-filter (cross-corpus exact dedup)
  // -------------------------------------------------------------------

  /** Incoming docs that MIGHT be exact duplicates of a reference-corpus
    * document, by Bloom-filter membership of the content fingerprint.
    * One aggregation pass over the reference builds the filter
    * (mergeable partials; the bitmap is MBs for 10⁹ docs at fpp 1%),
    * which is then broadcast and applied ROW-LOCALLY to the incoming
    * corpus — no shuffle of either corpus. No false negatives: every
    * true duplicate survives; ~fpp of non-duplicates ride along. */
  def bloomCandidates(incoming: DataFrame, reference: DataFrame,
                      idCol: String, textCol: String,
                      expectedItems: Long, fpp: Double): DataFrame = {
    val bloom = reference
      .select(xxhash64(fingerprint(col(textCol))).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bloomB = incoming.sparkSession.sparkContext.broadcast(bloom)
    // Deliberate exception to the no-UDF rule: Spark's BloomFilterMightContain
    // is not a public function, and a custom codegen'd Expression would have
    // to carry the filter in the serialized expression tree — re-shipping the
    // MB-scale bitmap with every stage where the broadcast ships it once per
    // executor. The UDF body is one xxhash probe against broadcast-local
    // bits; breaking codegen on this filter costs ~nothing next to the scan.
    val mightContain = udf((h: Long) => bloomB.value.mightContainLong(h))
    incoming
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .filter(mightContain(xxhash64(col("fp"))))
  }

  /** Exact document-grain cross-corpus dedup — "has this exact document
    * already been ingested" — with the Bloom pre-filter ahead of the
    * verify join. The final semi-join removes the Bloom's false
    * positives, so the RESULT is exact; the filter changes the plan,
    * not the answer: at 100 TB the verify join's probe side shrinks
    * from the whole incoming corpus to its duplicate fraction + fpp,
    * and the reference corpus is reduced to fingerprints before it
    * shuffles. Near-dup variants of the same cross-corpus question are
    * x38 (n-gram Jaccard) and x26 (n-gram contamination).
    *
    * Output: (idCol, fp) of incoming docs whose fingerprint exists in
    * the reference corpus. */
  def bloomCrossDedup(incoming: DataFrame, reference: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      expectedItems: Long = 1L << 20,
                      fpp: Double = 0.01): DataFrame = {
    val candidates =
      bloomCandidates(incoming, reference, idCol, textCol, expectedItems, fpp)
    candidates
      .join(reference.select(fingerprint(col(textCol)).as("fp")).distinct(),
        Seq("fp"), "left_semi")
      .select(col(idCol), col("fp"))
  }

  // -------------------------------------------------------------------
  // Winnowing (rolling-hash fingerprint) overlap detection
  // -------------------------------------------------------------------

  /** Document pairs sharing ≥ `minShared` winnowing fingerprints — the
    * plagiarism/shared-passage detector. The fingerprint equi-join IS the
    * blocking (pairs with no common selected hash never materialize);
    * by the winnowing guarantee every shared token run of length
    * ≥ w+k-1 is caught. Same scale shape as the shingle joins: explode →
    * equi-join on a 8-byte key → count.
    *
    * Common-fingerprint elimination (MOSS's "common code" handling, and
    * the scale guard): minimum-selection BIASES every document toward the
    * globally smallest gram hashes, so without suppression the join's
    * biggest buckets grow with the corpus and the pair count goes
    * quadratic — a fingerprint held by m docs contributes m² pairs.
    * Fingerprints appearing in more than `maxDocFreq` documents are
    * vocabulary-level, not passage-level, evidence and are dropped from
    * pair generation. Detection guarantee therefore applies to passages
    * shared by ≤ maxDocFreq documents (boilerplate shared by more is
    * exactly what a dedup pipeline wants to handle separately). */
  def winnowingOverlaps(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        k: Int = 3, w: Int = 4, minShared: Int = 3,
                        maxDocFreq: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the typed kernel decodes ids as Long: a silent cast would turn a
    // string id into null and fail far away with an opaque encoder error,
    // so reject non-integral id columns up front
    val idType = docs.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idType),
      s"winnowingOverlaps needs an integral id column; '$idCol' is $idType — " +
      "map your ids to long (e.g. monotonically_increasing_id or a hash) first")
    val fps = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        winnow(text, k, w).map(fp => (id, fp))
      })
      .toDF("id", "fp")
      // materialized once: referenced by the doc-frequency relation and
      // both self-join sides — 3 re-runs of the JVM winnow kernel otherwise
      .localCheckpoint()
    val rare = fps.groupBy(col("fp")).agg(count("*").as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select(col("fp"))
    val kept = fps.join(rare, Seq("fp")).localCheckpoint()
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count("*").as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  // -------------------------------------------------------------------
  // Embedding-cosine near-dup
  // -------------------------------------------------------------------

  /** Pairs of embeddings with cosine ≥ threshold — EXACT all-pairs
    * baseline (block-nested-loop). Correct by construction and the oracle
    * anchor; O(n²) scoring means it is the right plan only for bounded n.
    * The bound is ENFORCED: pointing the exact baseline at an unbounded
    * corpus is a quadratic explosion by design, so corpora larger than
    * `maxRows` are rejected with a pointer to the scale path,
    * [[embeddingNearDupsLsh]]. */
  def embeddingNearDups(emb: DataFrame, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        threshold: Double = 0.3,
                        maxRows: Long = 100000L): DataFrame = {
    val n = emb.count()
    require(n <= maxRows,
      s"embeddingNearDups is the EXACT all-pairs baseline: O(n^2) at n=$n rows " +
      s"exceeds maxRows=$maxRows. Use embeddingNearDupsLsh (bucketed candidates) " +
      "for unbounded corpora, or raise maxRows deliberately.")
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine_similarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Scale path for embedding near-dup: random-hyperplane LSH bucketing
    * as the candidate generator, exact cosine verification only inside
    * matching (table, bucket) cells — an equi-join, never a cross join.
    * Candidate volume is O(n · tables · E[bucket size]) instead of O(n²);
    * recall < 1 by construction (amplified by `tables` independent hash
    * tables; measured vs the exact baseline in DedupSpec). */
  /** x48: SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    * dedup via k-means cells: cluster the corpus (sampled spherical
    * fit via [[SimilaritySearch.clusterEmbeddings]]), materialize
    * candidate pairs ONLY within a cell, link pairs with cosine ≥
    * `threshold`, resolve duplicate groups by connected components,
    * and keep ONE representative per group — the member with the
    * LOWEST cosine to its cell centroid (the paper's rule: the least
    * typical exemplar preserves diversity), vec_id tie-break.
    *
    * vs [[embeddingNearDupsLsh]]: LSH blocking is data-oblivious;
    * SemDeDup's learned cells follow corpus density, and the cell
    * structure is shared with the IVF index (x15) — cluster once,
    * dedup AND search on the same partition of the space. Pairwise
    * work is Σ cellsize² — k must grow with n so cells stay bounded
    * (the paper's setting; `maxCellPairs` makes the contract loud
    * instead of letting one hot cell go quadratic).
    *
    * Output: (vec_id, cluster, component, cos_to_center, keep) for
    * EVERY input row — `keep=false` rows are the semantic duplicates
    * a pipeline drops. Learned centroids ⇒ rows-only driver check;
    * keeper rule, partition totality, and agreement with the exact
    * all-pairs baseline inside cells are spec-asserted. */
  def semDedup(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
               threshold: Double = 0.3, nClusters: Int = 8,
               idCol: String = "vec_id", vecCol: String = "embedding",
               seed: Long = 42L, maxCellPairs: Long = 1000000000L,
               cellCap: Int = Int.MaxValue): DataFrame = {
    val (assignments, _) = SimilaritySearch.clusterEmbeddings(
      spark, emb, nClusters, idCol, vecCol, seed)
    semDedupFrom(assignments, emb, threshold, idCol, vecCol,
      maxCellPairs, cellCap)
  }

  /** x108: [[semDedup]] with FIXED centroids — the embeddings of the
    * first `nClusters` ids stand in for a learned k-means fit; every
    * stage after assignment (cell cap, in-cell pairs, components,
    * least-typical keeper) is the SAME code the learned variant runs.
    * Removing the fit is exactly what makes the WHOLE operator
    * oracle-hash-checkable: assignment becomes argmax-cosine against a
    * deterministic relation both engines read from the same parquet,
    * so cluster ids, components, and the keeper verdicts all
    * hash-compare. A legitimate deployment mode in its own right
    * (SemDeDup against frozen/pre-trained centroids), and the
    * verification twin that pins the shared machinery x48/x102's
    * rows-only checks cannot. Ties: highest cosine, then lowest
    * centroid id — both on the raw double (engine-parity is the x09
    * contract); cos_to_center is round(6) after the argmax. */
  def semDedupFixedCentroids(emb: DataFrame,
                             threshold: Double = 0.3, nClusters: Int = 8,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             maxCellPairs: Long = 1000000000L,
                             cellCap: Int = Int.MaxValue): DataFrame = {
    val cents = emb.filter(col(idCol) < nClusters)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    val assignments = emb
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos",
        VectorFunctions.cosine_similarity(col("__v"), col("__cv")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("__cid"), col("__cos")),
        struct(col("__cos"), -col("__cid"))).as("__b"))
      .select(col("vec_id"), col("__b.__cid").as("cluster"),
              round(col("__b.__cos"), 6).as("cos_to_center"))
    semDedupFrom(assignments, emb, threshold, idCol, vecCol,
      maxCellPairs, cellCap)
  }

  /** The shared post-assignment SemDeDup machinery — everything after
    * "each vector has a (cluster, cos_to_center)". */
  private def semDedupFrom(assignments: DataFrame, emb: DataFrame,
                           threshold: Double, idCol: String, vecCol: String,
                           maxCellPairs: Long, cellCap: Int): DataFrame = {
    // cellCap: the df-cap story, embedding edition. On mass-duplicated
    // corpora a hot cell's pairwise work grows quadratically in the
    // duplication factor; capping each cell to its `cellCap` members
    // CLOSEST to the centroid (the densest region, where duplicates
    // concentrate; (cos desc, id asc) deterministic) bounds pair work
    // at nClusters·cellCap² while uncapped members pass through
    // untouched (keep=true singletons — never examined, stated in the
    // contract). The bounded-heap aggregator keeps the cap's shuffle
    // O(cells·cap), the x51 pattern — never a rank window over the
    // corpus.
    val examined =
      if (cellCap == Int.MaxValue) assignments
      else assignments.groupBy(col("cluster"))
        .agg(graft.functions.TopKAggregator.topk(cellCap)(
          col("cos_to_center"), col("vec_id")).as("__tk"))
        .select(col("cluster"), explode(col("__tk")).as("__s"))
        .select(col("cluster"), col("__s.id").as("vec_id"),
                col("__s.score").as("cos_to_center"))
    val withVec = examined
      .join(emb.select(col(idCol).as("vec_id"), col(vecCol).as("__v")), "vec_id")
      .localCheckpoint() // both self-join sides (plans are trees, not DAGs)

    val pairBudget = withVec.groupBy(col("cluster")).count()
      .agg(sum(col("count") * col("count"))).head.getLong(0)
    require(pairBudget <= maxCellPairs,
      s"semDedup cell-pair budget $pairBudget exceeds maxCellPairs=$maxCellPairs: " +
      "raise nClusters so cells stay bounded (k must grow with n), or raise " +
      "maxCellPairs deliberately.")

    val pairs = withVec.as("a").join(withVec.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", VectorFunctions.cosine_similarity(col("a.__v"), col("b.__v")))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    val labels = Components.connectedComponents(pairs)

    // singletons keep their own id as component; keeper = argmin
    // (cos_to_center, vec_id) per component via a partial-aggregable
    // min_by (no rank window — same scale contract as topKPerQuery)
    val labeled = assignments
      .join(labels.withColumnRenamed("doc_id", "__lid"),
        col("vec_id") === col("__lid"), "left")
      .withColumn("component", coalesce(col("component"), col("vec_id")))
      .drop("__lid")
    val keepers = labeled.groupBy(col("component"))
      .agg(min_by(col("vec_id"), struct(col("cos_to_center"), col("vec_id")))
        .as("__keeper"))
    labeled.join(keepers, "component")
      .select(col("vec_id"), col("cluster"), col("component"),
        col("cos_to_center"), (col("vec_id") === col("__keeper")).as("keep"))
  }

  /** planes ≤ 0 (the default) = ADAPTIVE: ceil(log2(n / 64)) with a
    * floor of 4, so the bucket count tracks the corpus and E[bucket]
    * stays ≈ 64. This is the lshTopK Scaladoc's "planes should grow
    * with log(n)" made code: with FIXED planes the 2^planes·tables key
    * space saturates (4 planes = 128 buckets total — a 100k-vector
    * corpus puts ~6k vectors in every bucket and candidate volume is
    * n²/32 no matter the data). Finer buckets cost wide-angle recall
    * (the S-curve: per-table collision = (1−θ/π)^planes) but barely
    * touch true near-dups — at cosine 0.999 (θ≈1.4°) nine planes still
    * collide per-table with p≈0.96 — which is exactly the trade a
    * near-dup blocker should make as n grows. One count() job when
    * adaptive (metadata-fast on parquet). */
  def embeddingNearDupsLsh(emb: DataFrame, idCol: String = "vec_id",
                           vecCol: String = "embedding",
                           threshold: Double = 0.3,
                           dim: Int = 64, planes: Int = 0, tables: Int = 8,
                           seed: Long = 42L): DataFrame = {
    val p =
      if (planes > 0) planes
      else {
        val m = emb.count() / 64
        math.max(4, if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1))
      }
    val bucketed = SimilaritySearch.bucketize(
      emb.select(col(idCol).as("id"), col(vecCol).as("v")),
      "v", dim, p, tables, seed)
      .localCheckpoint() // both self-join sides; see ngramJaccardAll note
    bucketed.as("x").join(bucketed.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
              col("x.v").as("v_a"), col("y.v").as("v_b"))
      .distinct()
      .withColumn("cosine", VectorFunctions.cosine_similarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** [[embeddingNearDupsLsh]] with an asymmetric, MULTI-PROBED query
    * side (the x110 composition, verdict r14 #6): the corpus-sized
    * `items` side keeps the bit-identical adaptive-plane index —
    * planes from `items.count()`, same bucketize, so the item side is
    * UNCHANGED vs the symmetric path — while the (small) `queries`
    * side probes its base bucket plus the `probes` least-confident
    * plane flips per table. Finer adaptive buckets trade wide-angle
    * recall for bounded candidates; probing buys recall back at
    * (1+probes)× QUERY keys instead of re-bucketing the corpus.
    * Exactly the split-leakage regime: the eval split is the query
    * side. Emits (id_a, id_b, cosine) with id_a < id_b — only pairs
    * with at least one member in `queries` are generated, which is
    * total for cross-split auditing (a cross-split pair always has a
    * non-train member). `probes = 0` restricted to such pairs equals
    * [[embeddingNearDupsLsh]]'s subset exactly (spec-pinned). */
  def embeddingNearDupsLshMultiProbe(items: DataFrame, queries: DataFrame,
                                     idCol: String = "vec_id",
                                     vecCol: String = "embedding",
                                     threshold: Double = 0.3,
                                     dim: Int = 64, planes: Int = 0,
                                     tables: Int = 8, probes: Int = 2,
                                     seed: Long = 42L): DataFrame = {
    val p =
      if (planes > 0) planes
      else {
        val m = items.count() / 64
        math.max(4, if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1))
      }
    val it = SimilaritySearch.bucketize(
      items.select(col(idCol).as("id"), col(vecCol).as("v")),
      "v", dim, p, tables, seed)
    val q = SimilaritySearch.multiProbeKeys(
        queries.select(col(idCol).as("qid"), col(vecCol).as("qv")),
        "qid", "qv", dim, p, tables, probes, seed)
      .localCheckpoint() // small side; fence the probe expressions off the join
    // query side broadcasts; the corpus-sized index never shuffles
    it.join(broadcast(q),
        it("tbl") === q("tbl") && it("bucket") === q("bucket") &&
          col("id") =!= col("qid"))
      .select(
        when(col("qid") < col("id"), col("qid")).otherwise(col("id")).as("id_a"),
        when(col("qid") < col("id"), col("id")).otherwise(col("qid")).as("id_b"),
        when(col("qid") < col("id"), col("qv")).otherwise(col("v")).as("v_a"),
        when(col("qid") < col("id"), col("v")).otherwise(col("qv")).as("v_b"))
      .distinct() // union across tables AND probes (and both orientations)
      .withColumn("cosine", VectorFunctions.cosine_similarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  // -------------------------------------------------------------------
  // Exact duplicated SUBSTRING spans (Lee et al. 2022, "Deduplicating
  // Training Data Makes Language Models Better" — the suffix-array
  // ExactSubstr dedup, re-expressed relationally)
  // -------------------------------------------------------------------

  /** Maximal duplicated token spans: for every document, the merged
    * intervals of token positions covered by some word `n`-gram that
    * occurs at ≥ `minOcc` locations corpus-wide (a location = one
    * (doc, start-position); a gram repeated INSIDE one document is
    * duplicated too, exactly as in the suffix-array formulation).
    *
    * Where the reference family's document/segment/near-dup entries
    * decide "is this WHOLE text a copy", this is the span-level
    * primitive: boilerplate headers, quoted passages and templated
    * paragraphs inside otherwise-unique documents. Output one row per
    * maximal span: (doc_id, span_start, span_end, span_tokens,
    * n_grams), positions 0-based token indices, inclusive; overlapping
    * OR adjacent (next start = current end + 1) flagged grams merge —
    * adjacency means every token in between is itself covered by a
    * duplicated gram, so the whole region is one duplicated passage.
    *
    * Plan: no pair join anywhere — unlike near-dup candidate
    * generation there is no m²/2 blowup for an m-location gram, so no
    * df cap is needed; the hottest gram contributes m rows, linear.
    * Two linear shuffles: (1) a window count partitioned by the gram
    * string (the same one-reference trick as [[cappedCandidates]] —
    * one gram scan, not a groupBy+join's two); (2) the per-document
    * interval merge, a classic gaps-and-islands pair of windows over
    * (doc, pos) — partitions bounded by document token count. The
    * final groupBy(doc, island) reuses shuffle (2)'s hash partitioning
    * (grouping keys ⊇ partitioning keys ⇒ no third exchange). Gram
    * enumeration is the codegen'd positional kernel
    * `word_gram_seq` (one pass, stays in WholeStageCodegen — the HOF
    * `transform ∘ sequence ∘ slice` equivalent is CodegenFallback).
    *
    * Production sizing: Lee et al. use 50-token spans; the gram width
    * `n` IS that knob (a duplicated region shorter than `n` tokens is
    * never flagged). At 100 TB the gram-string shuffle dominates;
    * swapping the window key for `xxhash64(sh)` shuffles 8-byte keys
    * instead of ~6·n-char strings at a ~(locations²/2⁶⁵) false-flag
    * risk — semantics kept exact here for oracle parity. */
  def duplicatedSpans(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", n: Int = 4,
                      minOcc: Int = 2): DataFrame = {
    val flagged = docs
      .select(col(idCol).as("id"),
              posexplode(gramSeq(col(textCol), n)).as(Seq("pos", "sh")))
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__occ") >= minOcc)
      .select(col("id"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(n - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    flagged
      .withColumn("__brk",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("__island", sum(col("__brk")).over(byDoc))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
           (max(col("pos")) + lit(n - 1)).as("span_end"),
           count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
              (col("span_end") - col("span_start") + 1).as("span_tokens"),
              col("n_grams"))
  }

  /** ExactSubstr CLEANING: rewrite every document with its non-first
    * duplicated spans removed — the full Lee et al. 2022 dedup, where
    * [[duplicatedSpans]] only reports. For each duplicated gram the
    * corpus-wide FIRST occurrence (min (doc, pos)) is the keeper; a
    * token is removed iff some non-keeper occurrence of a duplicated
    * gram covers it. So the first copy of a boilerplate passage
    * survives verbatim, every later copy disappears, and an exact
    * full-duplicate document cleans to the empty string. Output:
    * (doc_id, cleaned_text, kept_tokens, removed_tokens) for EVERY
    * document, fully-cleaned ones included.
    *
    * Plan: the same gram-partitioned window as [[duplicatedSpans]] now
    * computes occurrence count AND first-occurrence key in one
    * exchange; non-keeper occurrences explode to their ≤ n covered
    * token positions (duplication-bounded, not corpus-bounded), and
    * removal is a left-anti equi-join against the token relation on
    * (doc, position). Reassembly sorts each document's kept tokens
    * INSIDE a hash aggregate (collect_list → array_sort → array_join),
    * never a global sort. Four linear shuffles, no pair join — the
    * boilerplate pathology cannot occur by construction.
    *
    * First-occurrence keys encode (doc, pos) as `doc·2²⁰ + pos` so the
    * min is a plain long aggregation on both engines; each document is
    * required to stay under 2²⁰ tokens — checked per document inside
    * the distributed gram scan (`raise_error`, no extra driver
    * action). */
  def spanDedupClean(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", n: Int = 4,
                     minOcc: Int = 2): DataFrame = {
    val PosBits = 20
    // The guard must sit INSIDE an expression the plan actually
    // evaluates — a standalone check column would be pruned away with
    // its raise_error. Gating the text itself makes it load-bearing on
    // both consuming paths.
    val boundedText = when(
        size(split(col(textCol), " ", -1)) < lit(1 << PosBits), col(textCol))
      .otherwise(raise_error(concat(
        lit(s"document exceeds the 2^$PosBits-token position bound: "),
        col(idCol).cast("string"))))
    val grams = docs
      .select(col(idCol).as("id"),
              posexplode(gramSeq(boundedText, n)).as(Seq("pos", "sh")))
    val bySh = Window.partitionBy(col("sh"))
    val key = col("id") * lit(1L << PosBits) + col("pos")
    val nonFirst = grams
      .withColumn("__occ", count(lit(1)).over(bySh))
      .withColumn("__first", min(key).over(bySh))
      .filter(col("__occ") >= minOcc && key =!= col("__first"))
    removeCoveredTokens(docs, nonFirst, idCol, textCol, n)
  }

  /** Shared tail of the span CLEANERS ([[spanDedupClean]],
    * [[crossSpanClean]]): expand flagged gram starts `(id, pos)` to
    * their ≤ n covered token positions (duplication-bounded), remove
    * those tokens with a left-anti equi-join against the token
    * relation, reassemble each document's survivors inside a hash
    * aggregate (collect_list → array_sort → array_join — never a
    * global sort), and restore fully-cleaned documents as empty
    * strings via a left join back to the corpus. */
  private def removeCoveredTokens(docs: DataFrame, flagged: DataFrame,
                                  idCol: String, textCol: String,
                                  n: Int): DataFrame = {
    val removed = flagged
      .select(col("id"), explode(sequence(col("pos"),
        col("pos") + lit(n - 1))).as("tp"))
      .distinct()
    val toks = docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), " ", -1)).as(Seq("tp", "tok")))
    val kept = toks.join(removed, Seq("id", "tp"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("tp"), col("tok")))),
             x => x("tok")), " ").as("cleaned_text"),
           count(lit(1)).as("kept_tokens"))
    docs.select(col(idCol),
        size(split(col(textCol), " ", -1)).cast("long").as("__total"))
      .join(kept.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
              coalesce(col("cleaned_text"), lit("")).as("cleaned_text"),
              coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
              (col("__total") - coalesce(col("kept_tokens"), lit(0L)))
                .as("removed_tokens"))
  }

  /** CROSS-corpus span cleaning: remove from `incoming` every token
    * covered by a word `n`-gram that occurs ANYWHERE in `reference` —
    * span-grain decontamination ("scrub eval-set passages / the
    * existing training set's boilerplate out of the new crawl before
    * admission"), the cross-corpus sibling of [[spanDedupClean]] the
    * same way x38/x63 are x08/x17's. Every incoming document comes
    * back (possibly empty); reference is never modified.
    *
    * Plan: reference collapses to its DISTINCT gram set (one partial
    * agg'd shuffle, no positions needed); flagging is a left-semi
    * equi-join of incoming's positional grams against it — per-gram
    * cost is incoming's occurrence count, linear, regardless of how
    * common the gram is on either side (no pair join, no df cap
    * needed). Then the shared removal/reassembly tail. */
  /** Per-incoming-document MAXIMUM SHARED SPAN against a reference
    * corpus — the "how bad is the worst leak" triage metric between
    * x26's binary contamination flag and x67's destructive scrub: for
    * each incoming document, the longest stretch of tokens every one
    * of which is covered by some n-gram also present in the reference,
    * plus the shared-gram and shared-span counts. Ranking eval docs by
    * `max_shared_tokens` is the order a decontamination review works
    * through — a 40-token verbatim passage is a leak, three scattered
    * 4-grams are noise, and the binary flag cannot tell them apart.
    *
    * Same per-gram grain as the whole span family (x64–x67): a span is
    * a maximal island of reference-covered token positions; each gram
    * may match a different reference document. Plan: the reference
    * collapses to its distinct gram set (one partial-agg'd shuffle,
    * never re-expanded), flagging is a left-semi equi-join, and the
    * islands run in the SAME per-doc window partitioning as
    * [[duplicatedSpans]] — per-gram cost is the incoming occurrence
    * count, linear both sides, no pair join, so the boilerplate
    * pathology cannot occur. Documents sharing nothing report zeros
    * (full outer coverage, x65's discipline). */
  def maxSharedSpan(incoming: DataFrame, reference: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 4): DataFrame =
    maxSharedSpanAgainst(incoming,
      reference.select(explode(gramSeq(col(textCol), n)).as("sh")).distinct(),
      idCol, textCol, n)

  /** [[maxSharedSpan]] against a PRE-COLLAPSED distinct reference gram
    * set — the streamed twin (s33) pins that relation once and scores
    * every micro-batch against it (the [[crossSpanCleanAgainst]]
    * discipline). Per-incoming-doc given the gram set, so any batching
    * of the incoming corpus yields identical per-doc results. */
  def maxSharedSpanAgainst(incoming: DataFrame, refGrams: DataFrame,
                           idCol: String = "doc_id", textCol: String = "text",
                           n: Int = 4): DataFrame = {
    val matched = incoming
      .select(col(idCol).as("id"),
              posexplode(gramSeq(col(textCol), n)).as(Seq("pos", "sh")))
      .join(refGrams, Seq("sh"), "left_semi")
      .select(col("id"), col("pos"))
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + lit(n - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val perDoc = matched
      .withColumn("__brk",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("__island", sum(col("__brk")).over(byDoc))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(n - 1)).as("e"),
           count(lit(1)).as("g"))
      .groupBy(col("id"))
      .agg(max(col("e") - col("s") + 1).as("max_shared_tokens"),
           sum(col("g")).as("n_shared_grams"),
           count(lit(1)).as("n_spans"))
    incoming.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .na.fill(0L, Seq("max_shared_tokens", "n_shared_grams", "n_spans"))
      .select(col("id").as(idCol), col("max_shared_tokens"),
              col("n_shared_grams"), col("n_spans"))
  }

  def crossSpanClean(incoming: DataFrame, reference: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     n: Int = 4): DataFrame =
    crossSpanCleanAgainst(incoming,
      reference.select(explode(gramSeq(col(textCol), n)).as("sh")).distinct(),
      idCol, textCol, n)

  /** [[crossSpanClean]] against a PRE-COLLAPSED distinct reference gram
    * set (single `sh` column) — the streamed twin (s26) computes that
    * relation once, pins it, and re-cleans every micro-batch against it
    * without re-aggregating the reference. Cleaning is per-incoming-doc
    * given the gram set, so any partition of the incoming corpus into
    * batches yields byte-identical per-doc results. */
  private[graft] def crossSpanCleanAgainst(incoming: DataFrame,
                                           refGrams: DataFrame,
                                           idCol: String, textCol: String,
                                           n: Int): DataFrame = {
    val flagged = incoming
      .select(col(idCol).as("id"),
              posexplode(gramSeq(col(textCol), n)).as(Seq("pos", "sh")))
      .join(refGrams, Seq("sh"), "left_semi")
    removeCoveredTokens(incoming, flagged, idCol, textCol, n)
  }

  /** Per-document duplication profile over [[duplicatedSpans]]: how
    * much of EACH document is corpus-duplicated text — the curation
    * signal ("drop documents that are > X% boilerplate") the span
    * primitive exists to feed. One row per document (zero-span
    * documents included, with zeros): (doc_id, n_spans, dup_tokens,
    * total_tokens, dup_ratio). Token counts use the same
    * split-on-single-space semantics as gram enumeration, so
    * dup_ratio ∈ [0, 1] exactly. The spans side aggregates down to ≤
    * one row per document BEFORE the join back to the corpus, so the
    * join's build side is duplication-bounded, not corpus-bounded. */
  def spanDupProfile(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", n: Int = 4,
                     minOcc: Int = 2): DataFrame = {
    val perDoc = duplicatedSpans(docs, idCol, textCol, n, minOcc)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("dup_tokens"))
    docs.select(col(idCol),
                (size(split(col(textCol), " ", -1))).as("total_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
              coalesce(col("n_spans"), lit(0L)).as("n_spans"),
              coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
              col("total_tokens").cast("long").as("total_tokens"),
              round(coalesce(col("dup_tokens"), lit(0L)) /
                    col("total_tokens"), 6).as("dup_ratio"))
  }

  // ---- x70: edit-distance similarity join ------------------------------

  /** All id-ordered pairs whose title prefixes are within `maxDist`
    * LEVENSHTEIN edits — the short-string near-dup grain (titles, URLs,
    * product names) where token-set Jaccard is too coarse: a
    * one-character typo changes a whole token but only one edit.
    *
    * Blocking is the positional q-gram count filter of Gravano et al.
    * (VLDB 2001, "Approximate string joins in a database (almost) for
    * free"): if ed(s1, s2) ≤ d then s1 and s2 share at least
    * max(|s1|,|s2|) − q + 1 − q·d positional q-grams whose positions
    * differ by at most d — so candidates come from ONE equi-join on the
    * gram with a row-local position filter and a group-count HAVING,
    * never a cartesian. Exact `levenshtein(_, _, maxDist)` (the
    * threshold form — O(d·len) per pair, early-exits above d) then
    * verifies candidates only. Guarantee: with a non-binding `maxOcc`
    * the count filter admits every true pair whose title length is
    * ≥ q·(d+1) (shorter titles are filtered out up front — the theorem
    * threshold would be ≤ 0 there and blocking degenerates); the
    * brute-force-equality spec proves exactly this. At corpus scale
    * `maxOcc` caps each gram's join contribution at maxOcc²/2 rows —
    * same boilerplate-guard semantics as [[ngramJaccardPairsCapped]]'s
    * df cap, same caveat: pairs sharing only above-cap grams can fall
    * below the count threshold.
    *
    * Scale shape: grams are row-local (codegen'd `transform(sequence)`,
    * no kernel UDF); the only corpus shuffles are the gram-window cap
    * and the blocking equi-join, both hash-partitioned on the gram; the
    * count filter runs inside the join's aggregation (partial-agg'd);
    * verify touches candidate pairs only, joined back to the
    * title relation (id-keyed, one row per doc).
    *
    * Output: (id_a, id_b, dist), id_a < id_b. */
  def editDistancePairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", prefixLen: Int = 30,
                        q: Int = 4, maxDist: Int = 5,
                        maxOcc: Int = 500): DataFrame = {
    val titles = docs.select(col(idCol).cast("long").as("id"),
        lower(substring(col(textCol), 1, prefixLen)).as("title"))
      .filter(length(col("title")) >= q * (maxDist + 1))
    val grams = titles
      .select(col("id"), length(col("title")).as("len"),
        explode(expr(
          s"transform(sequence(1, length(title) - ${q - 1}), " +
          s"p -> struct(p AS pos, substring(title, p, $q) AS gram))")).as("g"))
      .select(col("id"), col("len"), col("g.pos").as("pos"), col("g.gram").as("gram"))
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("__occ") <= maxOcc)
      .drop("__occ")
    val cands = grams.as("a").join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") &&
        abs(col("a.pos") - col("b.pos")) <= maxDist)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
               col("a.len").as("len_a"), col("b.len").as("len_b"))
      .agg(count(lit(1)).as("shared"))
      // (pos_a, pos_b) match rows can only OVERCOUNT the theorem's gram
      // tally (one gram may match several nearby positions) — safe for a
      // lower-bound filter; undercount is impossible.
      .filter(col("shared") >=
        greatest(greatest(col("len_a"), col("len_b")) - lit(q - 1 + q * maxDist),
                 lit(1)))
    cands.join(titles.as("ta"), col("id_a") === col("ta.id"))
      .join(titles.as("tb"), col("id_b") === col("tb.id"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("ta.title"), col("tb.title"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
  }
}
