package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication suite for web-text corpora (training-data pipeline
 * components): exact (content hash), n-gram Jaccard, MinHash+LSH and
 * SimHash. All Column-expression based — the heavy lifting is hash
 * group-bys and band-bucket equi-joins, which shuffle only on the hash
 * keys (never on document text).
 */
object Dedup {

  /**
   * Exact dedup: group by content md5, keep the smallest id per group.
   * Returns (text_md5, keep_id, dup_count) — one row per distinct text.
   * Map-side partial agg makes this one cheap shuffle of (md5, id).
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Word w-shingles (space-joined runs of `w` tokens). */
  def shingles(text: Column, w: Int): Column = {
    val words = split(text, " ")
    array_distinct(transform(sequence(lit(1), greatest(size(words) - (w - 1), lit(0))),
      i => concat_ws(" ", (0 until w).map(o => element_at(words, i + o)): _*)))
  }
  /** SQL twin over a words-list expression `ws` (provide via CTE alias). */
  def shinglesSql(ws: String, w: Int): String = {
    val parts = (0 until w).map(o => s"$ws[i+$o]").mkString(" || ' ' || ")
    s"list_distinct([$parts for i in range(1, GREATEST(len($ws) - ${w - 1}, 0) + 1)])"
  }

  /**
   * n-gram Jaccard near-dup pairs: candidate pairs come from the MinHash
   * LSH BANDS (the same banded equi-join as [[minhashLsh]] — shuffle key
   * is (band, band_key), never pairwise), each candidate then VERIFIED
   * with the exact shingle-set Jaccard. Round-1 used prefix-of-text
   * blocking, which goes quadratic on web boilerplate (shared "<html>…"
   * prefixes) and misses near-dups differing in the first bytes; MinHash
   * bands are the standard corpus-scale blocking key. Candidates are
   * deduped as BARE ID PAIRS before the shingle arrays are re-attached,
   * so shingles cross the wire once, not once per matching band.
   * Returns (id_a, id_b, inter, uni, jaccard) for pairs over `threshold`.
   */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   w: Int = 3, threshold: Double = 0.5): DataFrame = {
    // persist: otherwise CollapseProject inlines the shingle/signature
    // expressions into both sides of the self-join — recomputed per pair
    val withSh = df.select(col(idCol).as("id"), shingles(col(textCol), w).as("sh")).persist()
    val sig = withSh.select(col("id"), minhashFromShingles(col("sh")).as("sig")).persist()
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        bi => concat_ws(",", (1 to 4).map(r => element_at(col("sig"), bi * 4 + r)): _*))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_key"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val shA = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "uni", "jaccard")
  }

  /** Fixed MinHash parameter set: h_i(x) = (a_i * x + b_i) mod 2^31. */
  val MinhashParams: Seq[(Long, Long)] = (0 until 16).map { i =>
    ((2 * i + 1) * 104729L % 2147483647L, (i * 7919L + 13L) % 2147483647L)
  }

  /** 60-bit shingle id -> 31-bit space (md5-based, engine-identical). */
  private def shingleId(s: Column): Column = TextAnalysis.wordHash(s) % 2147483648L
  private def shingleIdSql(s: String): String = s"(${TextAnalysis.wordHashSql(s)} % 2147483648)"

  /**
   * MinHash signature (array of 16 longs) over word w-shingles.
   * The md5 shingle-ids are bound ONCE via a lambda variable
   * (`transform` over a 1-element wrapper) so the 16 hash functions
   * share them instead of re-hashing — 16x less md5 work.
   */
  def minhashSignature(text: Column, w: Int = 3): Column =
    minhashFromShingles(shingles(text, w))

  /** Signature from a precomputed shingle-array column. */
  def minhashFromShingles(sh: Column): Column = {
    val ids = transform(sh, s => shingleId(s))
    element_at(transform(array(ids), idsV =>
      array(MinhashParams.map { case (a, b) =>
        array_min(transform(idsV, x => (lit(a) * x + lit(b)) % 2147483648L))
      }: _*)), 1)
  }
  /** SQL twin over a words-list expression (e.g. a CTE's `ws`). */
  def minhashSignatureSql(ws: String, w: Int = 3): String = {
    val ids = s"[${shingleIdSql("s")} for s in ${shinglesSql(ws, w)}]"
    val sigs = MinhashParams.map { case (a, b) =>
      s"list_min([($a * x + $b) % 2147483648 for x in $ids])"
    }
    s"[${sigs.mkString(", ")}]"
  }

  /**
   * MinHash LSH candidate pairs: 4 bands x 4 rows — documents sharing any
   * full band collide; pairs scored by matching-minhash count (est.
   * Jaccard = matches/16). The band join is the scale path: shuffle on
   * (band_idx, band_key), never pairwise.
   */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String, w: Int = 3): DataFrame = {
    // persist: the 16-hash signature expression must materialize ONCE per
    // doc, not re-inline into both sides of the band self-join
    val sig = df.select(col(idCol).as("id"), minhashSignature(col(textCol), w).as("sig"))
      .persist()
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        bi => concat_ws(",", (1 to 4).map(r => element_at(col("sig"), bi * 4 + r)): _*))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b)))
        .as("matches"))
  }

  /**
   * 32-bit SimHash over distinct words: bit j set iff more word hashes
   * have bit j set than not (majority vote).
   */
  def simhash(text: Column): Column = {
    val whs = transform(array_distinct(split(text, " ")), w => TextAnalysis.wordHash(w))
    val n = size(whs)
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) => {
      val pow = pow2(j)
      // integral h >> j: exact long division (doubles would corrupt 60-bit hashes)
      val votes = aggregate(whs, lit(0L),
        (a, h) => a + graft.functions.idiv(h, pow) % 2L)
      acc + when(votes * 2 > n.cast("long"), pow).otherwise(0L)
    })
  }
  private def pow2(j: Column): Column = pow(lit(2.0), j.cast("double")).cast("long")
  def simhashSql(t: String): String = {
    val whs = s"[${TextAnalysis.wordHashSql("w")} for w in list_distinct(string_split($t, ' '))]"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), [CASE WHEN 2 * list_sum([(h // CAST(POWER(2, j) AS BIGINT)) % 2 for h in $whs]) > len($whs) THEN CAST(POWER(2, j) AS BIGINT) ELSE 0 END for j in range(0, 32)]), (acc, x) -> acc + x)"
  }
}
