package graft

/** DuckDB renderings of graft's deterministic text hashes
  * ([[graft.functions.TextHashing]]), so `q_fingerprint` and
  * `q_lang_id` can be hash-checked against an INDEPENDENT oracle
  * instead of rows-only.
  *
  * The Scala side works in Java `Long` arithmetic — i.e. mod 2^64 with
  * two's-complement wrap. DuckDB raises on BIGINT overflow, so every
  * operation here is rendered over HUGEINT (128-bit) values kept
  * canonical in [0, 2^64):
  *
  *  - `a * b mod 2^64` splits both operands at 2^32 (the a_hi*b_hi
  *    term vanishes mod 2^64; every partial product fits HUGEINT);
  *  - xor converts to signed BIGINT (bit pattern identical), xors,
  *    and converts back;
  *  - `>>> n` on the canonical form is plain `// 2^n`.
  *
  * The rolling fingerprint needs no rolling at all: the recurrence is
  * mod-2^64 consistent, so each window hash is computed directly as
  * `sum(c_j * B^(w-1-j)) mod 2^64` with the powers precomputed here
  * and inlined as literals. The splitmix `mix` steps are rendered as
  * stacked CTE columns (not nested lambdas) so each step is evaluated
  * once per row instead of exponentially re-expanded.
  *
  * FIDELITY BOUNDARY: bit-identical for text in the Basic Multilingual
  * Plane. The Scala side iterates UTF-16 code units (`charAt`,
  * `String.length`); the SQL side iterates code points
  * (`string_split`+`unicode`). These agree exactly on BMP text (the
  * synthetic corpora are ASCII) but diverge on supplementary-plane
  * characters (an emoji is two UTF-16 units, one code point) — if such
  * corpora appear, render surrogate pairs SQL-side before trusting a
  * mismatch.
  */
private[graft] object DuckHash {
  private val P64 = BigInt(1) << 64
  private val P32 = BigInt(1) << 32
  private val P63 = BigInt(1) << 63
  private val Gold = BigInt("9e3779b97f4a7c15", 16)
  private val MixM1 = BigInt("bf58476d1ce4e5b9", 16)
  private val MixM2 = BigInt("94d049bb133111eb", 16)
  private val FnvPrime = BigInt("100000001b3", 16)
  private val FnvInit = BigInt("cbf29ce484222325", 16)

  /** (a*b) mod 2^64, all intermediates within HUGEINT. */
  private def mulmod(a: String, b: String): String =
    s"(((($a)%$P32)*(($b)%$P32) + (((($a)%$P32)*(($b)//$P32) + " +
      s"(($a)//$P32)*(($b)%$P32))%$P32)*$P32)%$P64)"

  /** xor of two canonical u64 via the signed-BIGINT bit pattern. */
  private def xormod(a: String, b: String): String = {
    val sa = s"(CASE WHEN ($a) >= $P63 THEN ($a)-$P64 ELSE ($a) END)::BIGINT"
    val sb = s"(CASE WHEN ($b) >= $P63 THEN ($b)-$P64 ELSE ($b) END)::BIGINT"
    val x = s"xor($sa, $sb)"
    s"(CASE WHEN $x < 0 THEN $x::HUGEINT+$P64 ELSE $x::HUGEINT END)"
  }

  /** Canonical u64 -> the Java Long bit pattern as signed BIGINT. */
  private def toSigned(e: String): String =
    s"((CASE WHEN ($e) >= $P63 THEN ($e)-$P64 ELSE ($e) END)::BIGINT)"

  /** FNV-1a over the codepoints of `cp` (a HUGEINT list column) —
    * [[graft.functions.TextHashing.hash64]]. Sequential fold via
    * list_reduce with the init value prepended. */
  private def fnvOverCp(cp: String): String =
    s"list_reduce(list_prepend($FnvInit::HUGEINT, $cp), " +
      s"(acc, c) -> ${mulmod(xormod("acc", "c"), FnvPrime.toString)})"

  /** The four splitmix steps of [[TextHashing.mix]] as stacked SELECTs
    * over source `src`, carrying `keep` columns; input column `h`,
    * output column `mx`. `seed * GOLD mod 2^64` is precomputed. */
  private def mixSteps(seed: Long, keep: Seq[String], h: String,
      src: String): String = {
    val c1 = (BigInt(seed) * Gold).mod(P64)
    val cols = keep.mkString(", ")
    s"""SELECT $cols, ${xormod("m3", s"(m3)//${1L << 31}")} AS mx FROM (
       |  SELECT $cols, ${mulmod(xormod("m2", s"(m2)//${1L << 27}"),
            MixM2.toString)} AS m3 FROM (
       |    SELECT $cols, ${mulmod(xormod("m1", s"(m1)//${1L << 30}"),
            MixM1.toString)} AS m2 FROM (
       |      SELECT $cols, ${xormod(h, c1.toString)} AS m1 FROM $src
       |    )))""".stripMargin
  }

  private def tokensExpr(textCol: String): String =
    s"list_filter(string_split_regex(lower($textCol), " +
      """'[^\p{L}\p{N}]+'), t -> t <> '')"""

  private val cpExpr =
    "list_transform(string_split(text, ''), c -> unicode(c)::HUGEINT)"

  /** Oracle for `q_heavy_hitters` (term, cms_count): re-derives the
    * ENTIRE Count-Min sketch — per-seed splitmix buckets over the
    * FNV-1a term hash, the `d*w` count cells, the min-over-rows
    * estimate, collisions and all — in DuckDB integer math, then
    * takes the same (estimate DESC, term ASC) top-k. `w` must be a
    * power of two so the unsigned `% w` here equals the Scala side's
    * signed `& (w-1)` (see [[graft.functions.CmsBuckets]]). */
  def cmsTopTermsOracle(d: Int, w: Int, k: Int): String = {
    require((w & (w - 1)) == 0, s"w must be a power of two, got $w")
    val cpTerm =
      "list_transform(string_split(term, ''), c -> unicode(c)::HUGEINT)"
    val rows = (1 to d).map { i =>
      s"""m$i AS (${mixSteps(i.toLong, Seq("term"), "h0", "vh")}),
         |vb$i AS (SELECT term, (mx % $w)::INTEGER AS b FROM m$i),
         |c$i AS (SELECT vb$i.b AS b, count(*)::BIGINT AS c
         |  FROM occ JOIN vb$i USING (term) GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val joins = (1 to d).map(i =>
      s"JOIN vb$i ON vb$i.term = v.term JOIN c$i x$i ON x$i.b = vb$i.b")
      .mkString("\n")
    val leastE = (1 to d).map(i => s"x$i.c").mkString("least(", ", ", ")")
    s"""WITH tok AS (SELECT ${tokensExpr("text")} AS ts FROM documents),
       |occ AS (SELECT unnest(ts) AS term FROM tok),
       |vocab AS (SELECT DISTINCT term FROM occ),
       |vh AS (SELECT term, ${fnvOverCp(cpTerm)} AS h0 FROM vocab),
       |$rows
       |SELECT v.term, CAST($leastE AS BIGINT) AS cms_count
       |FROM vocab v
       |$joins
       |ORDER BY cms_count DESC, v.term
       |LIMIT $k""".stripMargin
  }

  /** Oracle for `q_fingerprint` (doc_id, fp, sh) — window-min rolling
    * fingerprint (w=16) + 64-bit simhash over stopword-split tokens,
    * both bit-identical to the Catalyst expressions. */
  def fingerprintOracle(w: Int = 16): String = {
    val pow = (0 until w).map(j => (BigInt(1000003).modPow(
      BigInt(w - 1 - j), P64)).toString + "::HUGEINT")
      .mkString("[", ",", "]")
    val winHash =
      s"(list_sum(list_transform(range(0,$w), j -> cp[i+j]*($pow)[j+1]))%$P64)"
    val bits = (0 until 64).map { b =>
      s"(CASE WHEN sum(CASE WHEN ((h//${BigInt(1) << b})%2)=1 " +
        s"THEN 1 ELSE -1 END) > 0 THEN ${BigInt(1) << b}::HUGEINT " +
        "ELSE 0::HUGEINT END)"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, $cpExpr AS cp, length(text) AS len,
       |         ${tokensExpr("text")} AS toks
       |  FROM documents
       |),
       |winh AS (
       |  SELECT b.doc_id, $winHash AS h
       |  FROM (SELECT doc_id, cp, unnest(range(1, len-$w+2)) AS i
       |        FROM base WHERE len >= $w) b(doc_id, cp, i)
       |),
       |fpmix AS (${mixSteps(13L, Seq("doc_id"), "h", "winh")}),
       |fpw AS (SELECT doc_id, min(${toSigned("mx")}) AS fp
       |        FROM fpmix GROUP BY doc_id),
       |tokrow AS (SELECT doc_id, unnest(toks) AS tok FROM base),
       |tokh AS (SELECT doc_id, (${fnvOverCp(
            "list_transform(string_split(tok,''), c -> unicode(c)::HUGEINT)")
          }) AS h0 FROM tokrow),
       |shmix AS (${mixSteps(7L, Seq("doc_id"), "h0", "tokh")}),
       |shw AS (SELECT doc_id, ${toSigned(s"($bits)")} AS sh
       |        FROM (SELECT doc_id, mx AS h FROM shmix) GROUP BY doc_id)
       |SELECT b.doc_id,
       |  CASE WHEN b.len < $w THEN ${toSigned(fnvOverCp("b.cp"))}
       |       ELSE f.fp END AS fp,
       |  coalesce(s.sh, 0) AS sh
       |FROM base b
       |LEFT JOIN fpw f USING (doc_id)
       |LEFT JOIN shw s USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin
  }

  /** Stepwise column-chain builder: each op lands in its own column of
    * a stacked SELECT, so multi-step hashes are evaluated once per row.
    * Composing them as one nested expression instead re-expands every
    * input reference — the 5-step murmur fold would duplicate its base
    * subexpression ~8^5 times. */
  private final class Chain(src: String, keep: Seq[String]) {
    private var steps = List.empty[(String, String)]
    private var n = 0
    def add(expr: String): String = {
      n += 1; val name = s"c$n"; steps ::= (name, expr); name
    }
    def render(): String = {
      var sql = src
      var cols = keep.mkString(", ")
      steps.reverse.foreach { case (name, expr) =>
        sql = s"SELECT $cols, $expr AS $name FROM ($sql)"
        cols += s", $name"
      }
      sql
    }
  }

  // ---- Murmur3 x86_32 (Spark's `hash()` / Murmur3Hash, seed 42) over
  // canonical u32 values; products stay within HUGEINT ----
  private val U32 = BigInt(1) << 32
  private def rotl32(x: String, r: Int): String =
    s"(((($x)*${1L << r})%$U32) + (($x)//${1L << (32 - r)}))"
  private def xor32(a: String, b: String): String =
    s"(xor(($a)::BIGINT, ($b)::BIGINT)::HUGEINT)"
  private def murmurMixStep(ch: Chain, h: String, v: String): String = {
    val k1 = ch.add(s"((($v)*3432918353)%$U32)")
    val k2 = ch.add(rotl32(k1, 15))
    val k3 = ch.add(s"((($k2)*461845907)%$U32)")
    val h1 = ch.add(xor32(h, k3))
    val h2 = ch.add(rotl32(h1, 13))
    ch.add(s"((($h2)*5 + 3864292196)%$U32)")
  }
  private def murmurFmix(ch: Chain, h: String, len: Int): String = {
    val a = ch.add(xor32(h, len.toString))
    val b = ch.add(xor32(a, s"($a)//65536"))
    val c = ch.add(s"((($b)*2246822507)%$U32)")
    val d = ch.add(xor32(c, s"($c)//8192"))
    val e = ch.add(s"((($d)*3266489909)%$U32)")
    ch.add(xor32(e, s"($e)//65536"))
  }
  private def murmurHashInt(ch: Chain, h: String, v: String): String =
    murmurFmix(ch, murmurMixStep(ch, h, v), 4)
  private def murmurHashLong(ch: Chain, h: String, v64: String): String = {
    val lo = ch.add(s"(($v64)%$U32)")
    val hi = ch.add(s"(($v64)//$U32)")
    murmurFmix(ch, murmurMixStep(ch, murmurMixStep(ch, h, lo), hi), 8)
  }

  /** CTE block computing the 64-bit simhash per doc —
    * [[TextHashing.simhash64]]: FNV per token, mix(seed 7), 64 vote
    * bits. Emits `sall(id, u, sh)`: canonical u64 + signed. */
  private def simhashCtes: String = {
    val c7 = (BigInt(7) * Gold).mod(P64)
    val bits = (0 until 64).map { b =>
      s"(CASE WHEN sum(CASE WHEN ((h//${BigInt(1) << b})%2)=1 " +
        s"THEN 1 ELSE -1 END) > 0 THEN ${BigInt(1) << b}::HUGEINT " +
        "ELSE 0::HUGEINT END)"
    }.mkString(" + ")
    s"""base AS (SELECT doc_id, ${tokensExpr("text")} AS toks
       |  FROM documents),
       |tokrow AS (SELECT doc_id, unnest(toks) AS tok FROM base),
       |h0 AS (SELECT doc_id, (${fnvOverCp(
            "list_transform(string_split(tok,''), c -> unicode(c)::HUGEINT)")
          }) AS f0 FROM tokrow),
       |m1 AS (SELECT doc_id, ${xormod("f0", c7.toString)} AS m1 FROM h0),
       |m2 AS (SELECT doc_id, ${mulmod(xormod("m1", s"(m1)//${1L << 30}"),
            MixM1.toString)} AS m2 FROM m1),
       |m3 AS (SELECT doc_id, ${mulmod(xormod("m2", s"(m2)//${1L << 27}"),
            MixM2.toString)} AS m3 FROM m2),
       |mx AS (SELECT doc_id, ${xormod("m3", s"(m3)//${1L << 31}")} AS h
       |  FROM m3),
       |shu AS (SELECT doc_id, ($bits) AS u FROM mx GROUP BY doc_id),
       |sall AS (SELECT b.doc_id AS id, coalesce(s.u, 0::HUGEINT) AS u,
       |    ${toSigned("coalesce(s.u, 0::HUGEINT)")} AS sh
       |  FROM base b LEFT JOIN shu s USING (doc_id))""".stripMargin
  }

  /** Oracle for `q_dedup_simhash` (id_a, id_b, hamming) — 4x16-bit
    * band buckets over the simhash, pairs within a bucket, Hamming
    * rerank. Renders the UNCAPPED pairing, which is exactly what
    * [[graft.operators.Dedup.cappedBucketJoin]] executes when no
    * bucket exceeds the cap (the guarded path is data-dependent block
    * chaining and is exercised by the OperatorsSpec hot-bucket suite
    * instead). */
  def dedupSimhashOracle(maxHamming: Int = 10): String =
    s"""WITH $simhashCtes,
       |banded AS (SELECT id, sh, b.band,
       |    (u // (CASE b.band WHEN 0 THEN 1 WHEN 1 THEN 65536
       |           WHEN 2 THEN 4294967296 ELSE 281474976710656 END))
       |      % 65536 AS bh
       |  FROM sall, (SELECT unnest([0,1,2,3]) AS band) b),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b,
       |    CAST(bit_count(xor(a.sh, b2.sh)) AS INTEGER) AS hamming
       |  FROM banded a JOIN banded b2
       |  ON a.band = b2.band AND a.bh = b2.bh AND a.id < b2.id)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming ORDER BY id_a, id_b""".stripMargin

  /** CTE block for the MinHash+LSH candidate/rerank pipeline of
    * [[Dedup.minHashLsh]] (k=64, bands=16, char-3-gram rerank): shingle
    * FNV (identical shingles deduped before the 64-permutation
    * explosion — the min is unaffected), the k splitmix permutations as
    * stacked columns, Spark-Murmur3 band hashes via the Chain builder,
    * candidate self-join, and exact 3-gram-hash-set Jaccard (the gram
    * SETS are FNV hashes, mirroring [[TextHashing.ngramJaccard]]
    * bit-for-bit, hash collisions included). Ends with
    * `jac(id_a, id_b, j)`. */
  private def minhashJaccardCtes: String = minhashJaccardCtes(
    """cand AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b
      |  FROM banded a JOIN banded b2
      |  ON a.band = b2.band AND a.bh = b2.bh AND a.id < b2.id)"""
      .stripMargin)

  private def minhashJaccardCtes(candCtes: String,
      docsSrc: String = "documents"): String = {
    val C = 3; val K = 64; val Rows = 4; val Bands = 16
    val lmax = (BigInt(1) << 63) - 1
    val ch = new Chain(
      s"SELECT id, band, s FROM sigall, " +
        s"(SELECT unnest(range(0, $Bands)) AS band)",
      Seq("id", "band", "s"))
    var h = murmurHashInt(ch, "42", "band")
    (0 until Rows).foreach { k =>
      h = murmurHashLong(ch, h, s"s[band*$Rows+${k + 1}]")
    }
    val bandedSql = s"SELECT id, band, $h AS bh FROM (${ch.render()})"
    s"""base AS (SELECT doc_id, text, ${tokensExpr("text")} AS toks,
       |    length(text) AS len FROM $docsSrc),
       |sh0 AS (SELECT doc_id, unnest(range(1, len(toks)-$C+2)) AS i, toks
       |  FROM base WHERE len(toks) >= $C),
       |shs AS (SELECT doc_id,
       |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sgl
       |  FROM sh0),
       |shh AS (SELECT doc_id, (${fnvOverCp(
            "list_transform(string_split(sgl,''), c -> unicode(c)::HUGEINT)")
          }) AS h0 FROM shs),
       |shd AS (SELECT DISTINCT doc_id, h0 FROM shh),
       |perm AS (SELECT doc_id, h0, j::HUGEINT AS j FROM shd,
       |  (SELECT unnest(range(1, ${K + 1})) AS j)),
       |p1 AS (SELECT doc_id, j, ${xormod("h0",
            mulmod("j", Gold.toString))} AS m1 FROM perm),
       |p2 AS (SELECT doc_id, j, ${mulmod(xormod("m1", s"(m1)//${1L << 30}"),
            MixM1.toString)} AS m2 FROM p1),
       |p3 AS (SELECT doc_id, j, ${mulmod(xormod("m2", s"(m2)//${1L << 27}"),
            MixM2.toString)} AS m3 FROM p2),
       |p4 AS (SELECT doc_id, j, ${xormod("m3", s"(m3)//${1L << 31}")} AS hj
       |  FROM p3),
       |sigm AS (SELECT doc_id, j, min(${toSigned("hj")}) AS sj
       |  FROM p4 GROUP BY doc_id, j),
       |sig AS (SELECT doc_id, list(CASE WHEN sj < 0
       |    THEN sj::HUGEINT+$P64 ELSE sj::HUGEINT END ORDER BY j) AS s
       |  FROM sigm GROUP BY doc_id),
       |sigall AS (SELECT b.doc_id AS id,
       |    coalesce(g.s, [${Seq.fill(K)(s"$lmax::HUGEINT").mkString(", ")}])
       |      AS s
       |  FROM base b LEFT JOIN sig g USING (doc_id)),
       |banded AS ($bandedSql),
       |$candCtes,
       |g0 AS (SELECT doc_id AS id, unnest(range(1, len-$C+2)) AS i, text
       |  FROM base WHERE len >= $C),
       |g1 AS (SELECT id, (${fnvOverCp(
            s"list_transform(string_split(text[i:i+$C-1],'')," +
              " c -> unicode(c)::HUGEINT)")}) AS gh FROM g0),
       |gw AS (SELECT id, list(DISTINCT gh) AS gs FROM g1 GROUP BY id),
       |gset AS (SELECT b.doc_id AS id, CASE
       |    WHEN b.len >= $C THEN coalesce(g.gs, []::HUGEINT[])
       |    WHEN b.len > 0 THEN [(${fnvOverCp(
            "list_transform(string_split(b.text,'')," +
              " c -> unicode(c)::HUGEINT)")})]
       |    ELSE []::HUGEINT[] END AS gs
       |  FROM base b LEFT JOIN gw g ON g.id = b.doc_id),
       |jac AS (SELECT c.id_a, c.id_b, CASE
       |    WHEN len(ga.gs) + len(gb.gs)
       |      - len(list_intersect(ga.gs, gb.gs)) = 0 THEN 1.0
       |    ELSE len(list_intersect(ga.gs, gb.gs))::DOUBLE /
       |      (len(ga.gs) + len(gb.gs)
       |        - len(list_intersect(ga.gs, gb.gs)))::DOUBLE END AS j
       |  FROM cand c JOIN gset ga ON ga.id = c.id_a
       |  JOIN gset gb ON gb.id = c.id_b)""".stripMargin
  }

  /** Oracle for `q_dedup_near` (id_a, id_b, jaccard). Same uncapped-
    * pairing caveat as [[dedupSimhashOracle]]. */
  def dedupNearOracle(minJaccard: Double = 0.2): String =
    s"""WITH $minhashJaccardCtes
       |SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac
       |WHERE j >= $minJaccard ORDER BY id_a, id_b""".stripMargin

  // ---- XXH64 (Spark's `xxhash64`, seed 42) of ONE signed BIGINT —
  // the block assignment hash of Dedup.cappedBucketJoin. Spark's
  // hashLong: h = seed+P5+8; k1 = rotl(v*P2,31)*P1; h ^= k1;
  // h = rotl(h,27)*P1+P4; then the 5-step avalanche. All steps in
  // canonical-u64 Chain columns (same mod-2^64 discipline as above).
  private val Xp1 = BigInt("9E3779B185EBCA87", 16)
  private val Xp2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val Xp3 = BigInt("165667B19E3779F9", 16)
  private val Xp4 = BigInt("85EBCA77C2B2AE63", 16)
  private val Xp5 = BigInt("27D4EB2F165667C5", 16)
  private def rotl64(x: String, r: Int): String =
    s"(((($x)*${BigInt(1) << r})%$P64) + (($x)//${BigInt(1) << (64 - r)}))"
  private def xxh64Long(ch: Chain, signedCol: String): String = {
    val u = ch.add(s"(CASE WHEN ($signedCol) < 0 THEN " +
      s"($signedCol)::HUGEINT+$P64 ELSE ($signedCol)::HUGEINT END)")
    val h0 = (BigInt(42) + Xp5 + 8).mod(P64)
    val k1 = ch.add(mulmod(u, Xp2.toString))
    val k2 = ch.add(rotl64(k1, 31))
    val k3 = ch.add(mulmod(k2, Xp1.toString))
    val h1 = ch.add(xormod(h0.toString, k3))
    val h2r = ch.add(rotl64(h1, 27))
    val h2 = ch.add(s"((${mulmod(h2r, Xp1.toString)} + $Xp4) % $P64)")
    val f1 = ch.add(xormod(h2, s"(($h2)//${BigInt(1) << 33})"))
    val f2 = ch.add(mulmod(f1, Xp2.toString))
    val f3 = ch.add(xormod(f2, s"(($f2)//${BigInt(1) << 29})"))
    val f4 = ch.add(mulmod(f3, Xp3.toString))
    ch.add(xormod(f4, s"(($f4)//${BigInt(1) << 32})"))
  }

  /** Oracle for `q_dedup_near_capped` — the BLOCK-CHAINED capacity
    * guard ([[graft.operators.Dedup.cappedBucketJoin]]) rendered
    * exactly: per-(band,bh) bucket sizes, `nb = max(1, ceil(sz/cap))`
    * blocks, block id `pmod(xxhash64(id), nb)`, each row probing its
    * own block plus (when a next block exists) the adjacent one, the
    * `orig != blk OR id_a < id_b` de-dup filter, then the same 3-gram
    * Jaccard rerank. A cap small enough to split buckets at the
    * verification SF proves the guarded path — not just the
    * under-cap collapse — against an independent engine. */
  def dedupNearCappedOracle(minJaccard: Double = 0.2,
      cap: Int = 2): String = {
    // the corpus UNION an id-shifted copy of itself: every LSH bucket
    // doubles, so with cap=2 real buckets split into nb >= 3 blocks —
    // which pairs survive then DEPENDS on the xxhash64 block
    // assignment, making the hash rendering load-bearing (at nb <= 2
    // the own+adjacent chain still covers every pair and a wrong hash
    // would be invisible)
    val src = "(SELECT doc_id, text FROM documents UNION ALL " +
      "SELECT doc_id + 1000000, text FROM documents)"
    val ch = new Chain("SELECT id, band, bh FROM banded",
      Seq("id", "band", "bh"))
    val xu = xxh64Long(ch, "id")
    val capped =
      s"""sizesc AS (SELECT band, bh, count(*) AS sz FROM banded
         |  GROUP BY band, bh),
         |bxx AS (SELECT id, band, bh, ${toSigned(xu)} AS xs
         |  FROM (${ch.render()})),
         |blockedc AS (SELECT id, band, bh, nb,
         |    ((xs % nb) + nb) % nb AS blk
         |  FROM (SELECT b.id, b.band, b.bh, b.xs,
         |      greatest(1, ceil(s.sz::DOUBLE / $cap)::BIGINT) AS nb
         |    FROM bxx b JOIN sizesc s USING (band, bh))),
         |cand AS (SELECT DISTINCT least(x.id, y.id) AS id_a,
         |    greatest(x.id, y.id) AS id_b
         |  FROM (SELECT id, band, bh, blk,
         |      unnest(CASE WHEN blk < nb - 1 THEN [blk, blk + 1]
         |        ELSE [blk] END) AS probe
         |    FROM blockedc) x
         |  JOIN blockedc y
         |    ON x.band = y.band AND x.bh = y.bh AND x.probe = y.blk
         |    AND x.id <> y.id
         |  WHERE x.blk <> y.blk OR x.id < y.id)""".stripMargin
    s"""WITH ${minhashJaccardCtes(capped, src)}
       |SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac
       |WHERE j >= $minJaccard ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for `q_dedup_near_inc` — the INCREMENTAL probe
    * ([[graft.operators.Dedup.minHashLshIncremental]]) re-derived:
    * the capped band index keeps the `cap` lowest-(xxhash64(id), id)
    * members per (band, bh) bucket, every NEW doc's band keys
    * (uncapped) probe it, pairs normalize (least, greatest) and
    * distinct, then the same 3-gram Jaccard rerank. A cap small
    * enough to bind at the verification SF proves the capped-index
    * semantics — including the hash-ordered representative choice —
    * against an independent engine. */
  def dedupNearIncOracle(newPred: String, cap: Int,
      minJaccard: Double = 0.2): String = {
    val ch = new Chain("SELECT id, band, bh FROM banded",
      Seq("id", "band", "bh"))
    val xu = xxh64Long(ch, "id")
    val capped =
      s"""cxx AS (SELECT id, band, bh, ${toSigned(xu)} AS xs
         |  FROM (${ch.render()})),
         |cidx AS (SELECT id, band, bh FROM (
         |    SELECT id, band, bh, row_number() OVER (
         |      PARTITION BY band, bh ORDER BY xs, id) AS rnk
         |    FROM cxx) WHERE rnk <= $cap),
         |cand AS (SELECT DISTINCT least(n.id, x.id) AS id_a,
         |    greatest(n.id, x.id) AS id_b
         |  FROM (SELECT id, band, bh FROM banded WHERE $newPred) n
         |  JOIN cidx x ON n.band = x.band AND n.bh = x.bh
         |    AND n.id <> x.id)""".stripMargin
    s"""WITH ${minhashJaccardCtes(capped)}
       |SELECT id_a, id_b, round(j, 4) AS jaccard FROM jac
       |WHERE j >= $minJaccard ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for `q_dedup_cluster` (doc_id, cluster) — connected
    * components of the near-dup pair graph by min-label propagation
    * (Dedup.clusters labels each component with its lowest node id).
    * Edges MATERIALIZED so the recursion iterates over the
    * 2|pairs| rows, not re-evaluating the whole minhash pipeline. */
  def dedupClusterOracle(minJaccard: Double = 0.2): String =
    s"""WITH RECURSIVE $minhashJaccardCtes,
       |pairsx AS MATERIALIZED (SELECT id_a, id_b FROM jac
       |  WHERE j >= $minJaccard),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairsx
       |  UNION SELECT id_b, id_a FROM pairsx),
       |verts AS (SELECT DISTINCT src AS vid FROM edges),
       |reach(vid, anc) AS (
       |  SELECT vid, vid FROM verts
       |  UNION
       |  SELECT e.dst, r.anc FROM reach r JOIN edges e ON e.src = r.vid
       |  WHERE r.anc < e.dst
       |)
       |SELECT vid AS doc_id, min(anc) AS cluster FROM reach
       |GROUP BY vid ORDER BY doc_id""".stripMargin

  /** Oracle for `q_triangles` (a, b, c) — triangle enumeration over
    * the same near-dup pair graph: canonical `a < b` edges from the
    * replayed MinHash pipeline, ordered-wedge join, closing-edge
    * probe (GraphOps.triangles' two-hash-join plan in SQL). */
  def trianglesOracle(minJaccard: Double = 0.2): String =
    s"""WITH $minhashJaccardCtes,
       |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard)
       |SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |FROM e e1 JOIN e e2 ON e2.a = e1.b
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
       |ORDER BY a, b, c""".stripMargin

  /** Oracle for `q_degree_dist` (degree, n_nodes) — the near-dup pair
    * graph's degree histogram from the same replayed edge set. */
  def degreeOracle(minJaccard: Double = 0.2): String =
    s"""WITH $minhashJaccardCtes,
       |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard),
       |n AS (SELECT a AS node FROM e UNION ALL SELECT b FROM e),
       |d AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM n
       |  GROUP BY 1)
       |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for `q_clustering_coeff` — per-node triangle count from
    * the same ordered-wedge join, degree from both endpoints, exact
    * ppm coefficient for degree ≥ 2 nodes. */
  def clusteringCoeffOracle(minJaccard: Double = 0.2): String =
    s"""WITH $minhashJaccardCtes,
       |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard),
       |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |  FROM e e1 JOIN e e2 ON e2.a = e1.b
       |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |tpn AS (SELECT node, count(*) AS triangles FROM (
       |    SELECT a AS node FROM tri
       |    UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri) GROUP BY 1),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
       |  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
       |  GROUP BY 1)
       |SELECT deg.node AS node, degree,
       |  CAST(coalesce(tpn.triangles, 0) AS BIGINT) AS triangles,
       |  CAST((CAST(coalesce(tpn.triangles, 0) AS HUGEINT) * 2000000)
       |    // (degree * (degree - 1)) AS BIGINT) AS cc_ppm
       |FROM deg LEFT JOIN tpn ON tpn.node = deg.node
       |WHERE degree >= 2 ORDER BY node""".stripMargin

  /** Oracle for `q_minhash_est` — the signature's own agreeing-
    * position estimate vs the exact replayed n-gram Jaccard, both at
    * 1e4 scale; `sigall` (the per-doc 64-slot signature) and `jac`
    * come from the same replayed MinHash pipeline. */
  def minhashEstimateOracle(minJaccard: Double = 0.2,
      numHashes: Int = 64): String =
    s"""WITH $minhashJaccardCtes,
       |pr AS (SELECT id_a, id_b, j FROM jac WHERE j >= $minJaccard),
       |est AS (SELECT p.id_a, p.id_b, p.j,
       |    list_sum(list_transform(sa.s, (x, i) ->
       |      CASE WHEN x = sb.s[i] THEN 1 ELSE 0 END)) AS m
       |  FROM pr p JOIN sigall sa ON sa.id = p.id_a
       |    JOIN sigall sb ON sb.id = p.id_b)
       |SELECT id_a, id_b,
       |  CAST((m * 10000) // $numHashes AS BIGINT) AS est_e4,
       |  CAST(round(round(j, 4) * 10000) AS BIGINT) AS jaccard_e4,
       |  CAST(abs((m * 10000) // $numHashes -
       |    CAST(round(round(j, 4) * 10000) AS BIGINT)) AS BIGINT)
       |    AS abs_err_e4
       |FROM est ORDER BY id_a, id_b""".stripMargin

  /** Oracle for `q_cluster_quality` — the min-label closure's
    * components joined back to their observed pairs: size, pair
    * count, floored mean Jaccard at 1e4. */
  def clusterQualityOracle(minJaccard: Double = 0.2): String =
    s"""WITH RECURSIVE $minhashJaccardCtes,
       |pairsx AS MATERIALIZED (SELECT id_a, id_b,
       |    CAST(round(round(j, 4) * 10000) AS BIGINT) AS j4
       |  FROM jac WHERE j >= $minJaccard),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst
       |  FROM pairsx UNION SELECT id_b, id_a FROM pairsx),
       |verts AS (SELECT DISTINCT src AS vid FROM edges),
       |reach(vid, anc) AS (
       |  SELECT vid, vid FROM verts
       |  UNION
       |  SELECT e.dst, r.anc FROM reach r JOIN edges e
       |    ON e.src = r.vid
       |  WHERE r.anc < e.dst
       |),
       |cl AS (SELECT vid, min(anc) AS cluster FROM reach GROUP BY 1),
       |q AS (SELECT cl.cluster, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(p.j4) AS BIGINT) AS sj
       |  FROM pairsx p JOIN cl ON cl.vid = p.id_a GROUP BY 1),
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
       |  FROM cl GROUP BY 1)
       |SELECT cluster, size, n_pairs,
       |  CAST(sj // n_pairs AS BIGINT) AS mean_jac_e4
       |FROM sz JOIN q USING (cluster) ORDER BY cluster""".stripMargin

  /** Oracle for `q_dup_inflation` — the min-label closure's clusters
    * joined to whitespace-token counts; the representative is the
    * component-minimum doc (`vid = cluster`). */
  def dupInflationOracle(minJaccard: Double = 0.2): String =
    s"""WITH RECURSIVE $minhashJaccardCtes,
       |px AS MATERIALIZED (SELECT id_a, id_b FROM jac
       |  WHERE j >= $minJaccard),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst
       |  FROM px UNION SELECT id_b, id_a FROM px),
       |verts AS (SELECT DISTINCT src AS vid FROM edges),
       |reach(vid, anc) AS (
       |  SELECT vid, vid FROM verts
       |  UNION
       |  SELECT e.dst, r.anc FROM reach r JOIN edges e
       |    ON e.src = r.vid
       |  WHERE r.anc < e.dst
       |),
       |cl AS (SELECT vid, min(anc) AS cluster FROM reach GROUP BY 1),
       |tc AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
       |      AS ntok
       |  FROM documents)
       |SELECT cluster, CAST(count(*) AS BIGINT) AS size,
       |  CAST(sum(ntok) AS BIGINT) AS tokens_total,
       |  CAST(sum(CASE WHEN vid = cluster THEN ntok ELSE 0 END)
       |    AS BIGINT) AS tokens_kept
       |FROM cl JOIN tc ON tc.doc_id = cl.vid
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for `q_kcore` — the unrolled peel over the same replayed
    * pair graph: `rounds` chained CTE stages, each dropping nodes of
    * degree < k and their edges, then the survivors' degrees. */
  def kCoreOracle(minJaccard: Double = 0.2, k: Int = 2,
      rounds: Int = 6): String = {
    val steps = (0 until rounds).map { r =>
      s"""d$r AS MATERIALIZED (SELECT n, CAST(count(*) AS BIGINT) AS d
         |  FROM (SELECT a AS n FROM e$r UNION ALL SELECT b FROM e$r)
         |  GROUP BY 1),
         |e${r + 1} AS MATERIALIZED (SELECT a, b FROM e$r
         |  WHERE a IN (SELECT n FROM d$r WHERE d >= $k)
         |    AND b IN (SELECT n FROM d$r WHERE d >= $k))"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $minhashJaccardCtes,
       |e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard),
       |$steps
       |SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM (
       |  SELECT a AS n FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Oracle for `q_label_prop` — synchronous label propagation over
    * the same replayed near-dup pair graph, UNROLLED round by round:
    * each node takes its neighbors' most frequent label with ties to
    * the smallest, rendered as the struct argmin
    * `(list_sort(list({negc, lbl})))[1]` — the field-wise
    * lexicographic order both engines share. */
  /** The shared CTE prefix replaying the near-dup pair graph and the
    * unrolled LPA rounds — [[labelPropOracle]] reads the final label
    * table straight, [[modularityOracle]] rolls it up. */
  private def labelPropCtes(minJaccard: Double, iters: Int): String = {
    val steps = (1 to iters).map { r =>
      s"""s$r AS MATERIALIZED (SELECT dir.dst AS node, l${r - 1}.lbl,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM dir JOIN l${r - 1} ON l${r - 1}.node = dir.src
         |  GROUP BY 1, 2),
         |l$r AS MATERIALIZED (SELECT node,
         |    ((list_sort(list(struct_pack(negc := -c, l := lbl))))[1])
         |      .l AS lbl
         |  FROM s$r GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""$minhashJaccardCtes,
       |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard),
       |dir AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
       |  UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM dir),
       |$steps""".stripMargin
  }

  def labelPropOracle(minJaccard: Double = 0.2,
      iters: Int = 3): String =
    s"""WITH ${labelPropCtes(minJaccard, iters)}
       |SELECT node, lbl AS community FROM l$iters
       |ORDER BY node""".stripMargin

  /** Oracle for `q_modularity` — the LPA rounds above, then Newman's
    * per-community contribution cleared of fractions:
    * `⌊(4m·e_c − d_c²)·10⁶ / 4m²⌋` on HUGEINT. DuckDB's `//`
    * TRUNCATES toward zero on integer types (verified on 1.0.0 —
    * same as Spark's div, NOT a floor), so the engine's sign-split
    * floorDiv is replayed here as the explicit CASE — without it a
    * sparse community's negative numerator would diverge by one. */
  def modularityOracle(minJaccard: Double = 0.2,
      iters: Int = 3): String =
    s"""WITH ${labelPropCtes(minJaccard, iters)},
       |lf AS MATERIALIZED (SELECT node, lbl FROM l$iters),
       |m AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
       |ec AS (SELECT la.lbl AS c, CAST(count(*) AS BIGINT) AS e_in
       |  FROM e JOIN lf la ON la.node = e.a
       |    JOIN lf lb ON lb.node = e.b
       |  WHERE la.lbl = lb.lbl GROUP BY 1),
       |dg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
       |  FROM dir GROUP BY 1),
       |dc AS (SELECT lf.lbl AS c, CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(dg.d) AS BIGINT) AS d_tot
       |  FROM dg JOIN lf ON lf.node = dg.node GROUP BY 1)
       |SELECT dc.c AS community, n_nodes,
       |  CAST(coalesce(e_in, 0) AS BIGINT) AS internal_edges,
       |  d_tot AS degree_sum,
       |  CAST(CASE WHEN (4 * m * coalesce(e_in, 0) -
       |      CAST(d_tot AS HUGEINT) * d_tot) < 0
       |    THEN -((-(4 * m * coalesce(e_in, 0) -
       |        CAST(d_tot AS HUGEINT) * d_tot) * 1000000
       |        + 4 * m * m - 1) // (4 * m * m))
       |    ELSE ((4 * m * coalesce(e_in, 0) -
       |      CAST(d_tot AS HUGEINT) * d_tot) * 1000000)
       |      // (4 * m * m) END AS BIGINT) AS contrib_ppm
       |FROM dc LEFT JOIN ec ON ec.c = dc.c CROSS JOIN m
       |ORDER BY community""".stripMargin

  /** Oracle for `q_bridge_pairs` — the LPA rounds above, then the
    * edges whose endpoints carry different final labels. */
  def bridgePairsOracle(minJaccard: Double = 0.2,
      iters: Int = 3): String =
    s"""WITH ${labelPropCtes(minJaccard, iters)},
       |lf AS MATERIALIZED (SELECT node, lbl FROM l$iters)
       |SELECT e.a AS id_a, e.b AS id_b,
       |  la.lbl AS community_a, lb.lbl AS community_b
       |FROM e JOIN lf la ON la.node = e.a
       |  JOIN lf lb ON lb.node = e.b
       |WHERE la.lbl <> lb.lbl
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle for `q_bridge_cut` — the LPA rounds above, then the
    * min-label recursive closure over ONLY the same-community edges;
    * vertices isolated by the cut keep themselves as cluster (the
    * reach recursion seeds every original vertex at itself). */
  def bridgeCutOracle(minJaccard: Double = 0.2,
      iters: Int = 3): String =
    s"""WITH RECURSIVE ${labelPropCtes(minJaccard, iters)},
       |lf AS MATERIALIZED (SELECT node, lbl FROM l$iters),
       |kept AS MATERIALIZED (SELECT e.a, e.b FROM e
       |  JOIN lf la ON la.node = e.a JOIN lf lb ON lb.node = e.b
       |  WHERE la.lbl = lb.lbl),
       |kdir AS MATERIALIZED (SELECT a AS src, b AS dst FROM kept
       |  UNION SELECT b, a FROM kept),
       |verts AS (SELECT DISTINCT src AS vid FROM dir),
       |reach(vid, anc) AS (
       |  SELECT vid, vid FROM verts
       |  UNION
       |  SELECT k.dst, r.anc FROM reach r JOIN kdir k
       |    ON k.src = r.vid
       |  WHERE r.anc < k.dst
       |),
       |cl AS (SELECT vid AS node, min(anc) AS cluster FROM reach
       |  GROUP BY 1),
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT)
       |    AS cluster_size
       |  FROM cl GROUP BY 1)
       |SELECT node, cluster, cluster_size
       |FROM cl JOIN sz USING (cluster) ORDER BY node""".stripMargin

  /** Oracle for `q_pagerank` — the UNROLLED integer PageRank over the
    * same replayed near-dup pair graph: each iteration is one chained
    * CTE running the identical fixed-point step
    * `((den−num)·scale + num·Σ(pr//d)) // den`, so the ranks are
    * engine-exact (floors replayed at every step, non-negative
    * operands so `//` ≡ Spark's IntegralDivide). */
  def pageRankOracle(minJaccard: Double = 0.2, iters: Int = 3,
      scale: Long = 1000000L, alphaNum: Long = 85L,
      alphaDen: Long = 100L): String = {
    val steps = (1 to iters).map { k =>
      s"""c$k AS (SELECT dir.dst AS node, sum(r${k - 1}.pr // deg.d) AS cs
         |  FROM dir JOIN r${k - 1} ON r${k - 1}.node = dir.src
         |    JOIN deg ON deg.src = dir.src
         |  GROUP BY 1),
         |r$k AS (SELECT deg.src AS node,
         |    CAST((${(alphaDen - alphaNum) * scale} +
         |      $alphaNum * coalesce(c$k.cs, 0)) // $alphaDen AS BIGINT)
         |      AS pr
         |  FROM deg LEFT JOIN c$k ON c$k.node = deg.src)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $minhashJaccardCtes,
       |e AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM jac
       |  WHERE j >= $minJaccard),
       |dir AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
       |  UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM dir
       |  GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST($scale AS BIGINT) AS pr
       |  FROM deg),
       |$steps
       |SELECT node, pr AS pr_c FROM r$iters ORDER BY node""".stripMargin
  }

  /** Oracle for `q_component_sizes` — the min-label closure's
    * per-cluster member counts, histogrammed. */
  def componentSizesOracle(minJaccard: Double = 0.2): String =
    s"""WITH RECURSIVE $minhashJaccardCtes,
       |pairsx AS MATERIALIZED (SELECT id_a, id_b FROM jac
       |  WHERE j >= $minJaccard),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst
       |  FROM pairsx UNION SELECT id_b, id_a FROM pairsx),
       |verts AS (SELECT DISTINCT src AS vid FROM edges),
       |reach(vid, anc) AS (
       |  SELECT vid, vid FROM verts
       |  UNION
       |  SELECT e.dst, r.anc FROM reach r JOIN edges e
       |    ON e.src = r.vid
       |  WHERE r.anc < e.dst
       |),
       |cl AS (SELECT vid, min(anc) AS cluster FROM reach GROUP BY 1),
       |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS size
       |  FROM cl GROUP BY 1)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_components
       |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin

  /** Oracle for `q_lang_id` (guessed, n) — per-char script
    * classification in the Scala else-if order, then stopword voting
    * with maxBy's (count, code) tie-break, exactly
    * [[graft.functions.LangGuess.guess]]. */
  def langIdOracle(stop: Map[String, Set[String]]): String = {
    def inList(vals: Set[String]): String =
      vals.toSeq.sorted.map(v => "'" + v.replace("'", "''") + "'")
        .mkString("(", ",", ")")
    // first-matching-range, like the Scala else-if chain; the regexp
    // letter test only runs for chars outside every script range
    val cls =
      """list_transform(string_split(text,''), ch -> CASE
        | WHEN unicode(ch) BETWEEN 19968 AND 40959 THEN 'zh'
        | WHEN unicode(ch) BETWEEN 12352 AND 12543 THEN 'ja'
        | WHEN unicode(ch) BETWEEN 44032 AND 55215 THEN 'ko'
        | WHEN unicode(ch) BETWEEN 1024 AND 1279 THEN 'ru'
        | WHEN unicode(ch) BETWEEN 1536 AND 1791 THEN 'ar'
        | WHEN unicode(ch) BETWEEN 3584 AND 3711 THEN 'th'
        | WHEN unicode(ch) BETWEEN 2304 AND 2431 THEN 'hi'
        | WHEN regexp_matches(ch, '^\p{L}$') THEN 'lat' ELSE 'x' END)"""
        .stripMargin.replace("\n", "")
    def cnt(k: String) = s"len(list_filter(cls, c -> c = '$k'))"
    val votes = stop.toSeq.sortBy(_._1).map { case (l, sw) =>
      s"len(list_filter(toks, t -> t IN ${inList(sw)})) AS v_$l"
    }.mkString(",\n    ")
    val vmax = "greatest(v_en, v_de, v_fr, v_es, v_it, v_pt)"
    val scr = "greatest(s_ja, s_zh, s_ko, s_ru, s_ar, s_th, s_hi)"
    s"""WITH base AS (
       |  SELECT doc_id, ${tokensExpr("text")} AS toks, $cls AS cls
       |  FROM documents
       |),
       |feat AS (
       |  SELECT doc_id, toks,
       |    ${cnt("ja")} AS s_ja, ${cnt("zh")} AS s_zh,
       |    ${cnt("ko")} AS s_ko, ${cnt("ru")} AS s_ru,
       |    ${cnt("ar")} AS s_ar, ${cnt("th")} AS s_th,
       |    ${cnt("hi")} AS s_hi, ${cnt("lat")} AS s_lat,
       |    $votes
       |  FROM base
       |),
       |g AS (
       |  SELECT doc_id, CASE
       |    WHEN $scr > 0 AND $scr*5 >= s_lat THEN
       |      CASE
       |        WHEN s_ja >= $scr THEN 'ja'
       |        WHEN s_zh >= $scr THEN
       |          (CASE WHEN s_ja > 0 THEN 'ja' ELSE 'zh' END)
       |        WHEN s_ko >= $scr THEN 'ko'
       |        WHEN s_ru >= $scr THEN 'ru'
       |        WHEN s_ar >= $scr THEN 'ar'
       |        WHEN s_th >= $scr THEN 'th'
       |        ELSE 'hi' END
       |    WHEN s_lat = 0 THEN 'und'
       |    WHEN len(toks) = 0 THEN 'und'
       |    WHEN $vmax = 0 THEN 'und'
       |    WHEN v_pt >= $vmax THEN 'pt'
       |    WHEN v_it >= $vmax THEN 'it'
       |    WHEN v_fr >= $vmax THEN 'fr'
       |    WHEN v_es >= $vmax THEN 'es'
       |    WHEN v_en >= $vmax THEN 'en'
       |    ELSE 'de' END AS guessed
       |  FROM feat
       |)
       |SELECT guessed, count(*) AS n FROM g
       |GROUP BY guessed ORDER BY guessed""".stripMargin
  }

  /** Oracle for `q_agg_approx_distinct` — graft's DETERMINISTIC
    * HyperLogLog ([[graft.HllDistinct]]) re-evaluated in SQL: the same
    * splitmix64 hash, bucket = top `p` bits, rank = leading zeros + 1
    * (floor-log2 via `bin()` string length — integer-exact, where
    * FP `log2` could misround near powers of two), registers as a
    * GROUP BY max, and the raw Flajolet estimator in exact HUGEINT
    * arithmetic. No floating point anywhere on either side, so the
    * BIGINT estimates match bit-for-bit. */
  def aggApproxDistinctOracle(p: Int = 8, seed: Long = 1L): String = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val m = 1 << p
    val rankMax = 64 - p + 1 // rank when the payload bits are all zero
    val bucketDiv = BigInt(1) << (64 - p)
    // alpha_m * m^2 / sum(2^-M) with alpha_m = 0.7213/(1 + 1.079/m)
    // rationalized: (7213*m / (10000*m + 10790)) * m^2 * 2^64 / S
    val num = BigInt(7213) * BigInt(m).pow(3) * P64
    val denC = BigInt(10000L * m + 10790)
    val mixed = mixSteps(seed, Seq("flag"), "pk",
      "(SELECT l_returnflag AS flag, l_partkey::HUGEINT AS pk " +
        "FROM lineitem)")
    s"""WITH hx AS ($mixed),
       |br AS (SELECT flag, ((mx) // $bucketDiv)::INTEGER AS bucket,
       |  ((mx) * $m) % $P64 AS w FROM hx),
       |rk AS (SELECT flag, bucket,
       |  CASE WHEN w = 0 THEN $rankMax
       |       WHEN (w // $P32) > 0
       |         THEN 33 - length(bin((w // $P32)::BIGINT))
       |       ELSE 65 - length(bin((w % $P32)::BIGINT)) END AS r
       |  FROM br),
       |regs AS (SELECT flag, bucket, max(r) AS mr
       |  FROM rk GROUP BY flag, bucket),
       |est AS (SELECT flag, count(*) AS present,
       |  sum((1::BIGINT << (63 - mr))::HUGEINT) AS t
       |  FROM regs GROUP BY flag)
       |SELECT flag AS l_returnflag,
       |  ($num // ($denC::HUGEINT * 2 *
       |    (t + ($m - present) * ((1::BIGINT << 62)::HUGEINT * 2))))::BIGINT
       |    AS approx_parts
       |FROM est ORDER BY l_returnflag""".stripMargin
  }

  /** Chain computing `pmod(xxhash64(doc_id), 100)` (Spark semantics:
    * hash interpreted signed, then positive mod) over `documents` —
    * shared by the two sampling oracles. Returns (renderedSql,
    * pmodColName). */
  private def docSampleChain(keep: Seq[String]): (String, String) = {
    val ch = new Chain(
      s"SELECT ${keep.mkString(", ")} FROM documents", keep)
    val xs = ch.add(toSigned(xxh64Long(ch, "doc_id")))
    val m = ch.add(s"((($xs) % 100) + 100) % 100")
    (ch.render(), m)
  }

  /** Oracle for `q_sample_stratified` —
    * [[graft.operators.CorpusOps.sampleByRate]] with a per-language
    * rate: keep iff pmod(xxhash64(doc_id), 100) < rate(lang).
    *
    * The chain MUST render inside `AS MATERIALIZED`: a single-use
    * subquery gets INLINED by DuckDB's optimizer, and substituting
    * each chain column into its consumers multiplies expression size
    * per step (mulmod references its input 4×) — the 13-step xxh64
    * fold then explodes to ~4^13 nodes and the optimizer OOMs the
    * machine. The capped-dedup oracle never hit this because its
    * chain CTE is referenced twice, which DuckDB materializes. */
  def sampleStratifiedOracle(enRate: Int, defaultRate: Int): String = {
    val (sql, m) = docSampleChain(Seq("doc_id", "lang", "source"))
    s"""WITH hx AS MATERIALIZED ($sql)
       |SELECT doc_id, lang, source FROM hx
       |WHERE $m < (CASE WHEN lang = 'en' THEN $enRate
       |  ELSE $defaultRate END)
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for `q_sample_topk` —
    * [[graft.operators.CorpusOps.sampleTopKPerStratum]]: first k docs
    * per language in (xxhash64(doc_id), doc_id) order. The rank sorts
    * on the SIGNED hash (Spark's xxhash64 column type is BIGINT).
    * MATERIALIZED for the same inlining-blowup reason as
    * [[sampleStratifiedOracle]]. */
  def sampleTopKOracle(k: Int): String = {
    val ch = new Chain(
      "SELECT doc_id, lang FROM documents", Seq("doc_id", "lang"))
    val xs = ch.add(toSigned(xxh64Long(ch, "doc_id")))
    s"""WITH hx AS MATERIALIZED (${ch.render()})
       |SELECT doc_id, lang, rn FROM (
       |  SELECT doc_id, lang, CAST(row_number() OVER (
       |    PARTITION BY lang ORDER BY $xs, doc_id) AS INTEGER) AS rn
       |  FROM hx)
       |WHERE rn <= $k ORDER BY lang, rn""".stripMargin
  }

  /** Oracle for `q_cluster_sample` —
    * [[graft.operators.Clustering.balancedSample]]: k-means assignment
    * (argmin over the caller-rendered per-centroid distance list
    * `dists`, evaluated over alias `v` = the double-cast embedding),
    * then the first k vectors per cluster in (xxhash64(vec_id),
    * vec_id) order. MATERIALIZED for the same inlining-blowup reason
    * as [[sampleStratifiedOracle]]. */
  def clusterSampleOracle(dists: String, k: Int): String = {
    val base = s"SELECT vec_id, CAST(list_grade_up($dists)[1] - 1" +
      " AS INTEGER) AS cluster FROM (SELECT vec_id," +
      " CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    val ch = new Chain(base, Seq("vec_id", "cluster"))
    val xs = ch.add(toSigned(xxh64Long(ch, "vec_id")))
    s"""WITH hx AS MATERIALIZED (${ch.render()})
       |SELECT vec_id, cluster, rn FROM (
       |  SELECT vec_id, cluster, CAST(row_number() OVER (
       |    PARTITION BY cluster ORDER BY $xs, vec_id) AS INTEGER) AS rn
       |  FROM hx)
       |WHERE rn <= $k ORDER BY cluster, rn""".stripMargin
  }

  /** Oracle for `q_corpus_mix` —
    * [[graft.operators.CorpusOps.mixCorpora]] over `lang` slices of
    * `documents`: per source, `full` whole copies via a `range` cross
    * join plus the ppm-threshold xxhash64 remainder (epoch = full).
    * Each remainder chain gets its own MATERIALIZED CTE for the same
    * inlining-blowup reason as [[sampleStratifiedOracle]]. */
  def corpusMixOracle(parts: Seq[(String, String, Int, Int)]): String = {
    val ctes = scala.collection.mutable.ListBuffer.empty[String]
    val segs = parts.zipWithIndex.flatMap {
      case ((nm, langV, full, ppm), i) =>
        val fullSql = if (full > 0) Some(
          s"""SELECT '$nm' AS mix_source, CAST(t.e AS INTEGER) AS epoch,
             |    doc_id
             |  FROM documents CROSS JOIN range(0, $full) t(e)
             |  WHERE lang = '$langV'""".stripMargin) else None
        val remSql = if (ppm > 0) Some {
          val ch = new Chain(
            s"SELECT doc_id FROM documents WHERE lang = '$langV'",
            Seq("doc_id"))
          val xs = ch.add(toSigned(xxh64Long(ch, "doc_id")))
          val m = ch.add(s"((($xs) % 1000000) + 1000000) % 1000000")
          ctes += s"hx$i AS MATERIALIZED (${ch.render()})"
          s"""SELECT '$nm' AS mix_source, $full AS epoch, doc_id
             |  FROM hx$i WHERE $m < $ppm""".stripMargin
        } else None
        fullSql.toSeq ++ remSql.toSeq
    }
    val withClause =
      if (ctes.isEmpty) "" else ctes.mkString("WITH ", ",\n", "\n")
    s"""${withClause}SELECT mix_source, epoch, doc_id FROM (
       |${segs.mkString("\nUNION ALL\n")})
       |ORDER BY mix_source, epoch, doc_id""".stripMargin
  }

  /** Oracle for `q_quality_model` —
    * [[graft.operators.QualityModel.score]] under a TRAINED
    * [[graft.operators.QualityModel.HashedLinearModel]] rendered into
    * the SQL (weights list + bias, like the IVF centroid oracles):
    * per-token FNV-1a feature hashing (`((h % dim) + dim) % dim`
    * mirrors Spark's `pmod` on the signed hash), a per-doc weight-sum
    * rollup, mean pooling over the token count, sigmoid, round(4).
    * `keep` is decided on the ROUNDED score on both sides. Tokenless
    * docs score the bare bias through the `dl > 0` CASE. */
  def qualityScoreOracle(dim: Int, bias: Double, weights: Array[Double],
      threshold: Double): String = {
    val wl = weights.map(_.toString).mkString("[", ", ", "]")
    val hs = toSigned(fnvOverCp(
      "list_transform(string_split(tk,''), c -> unicode(c)::HUGEINT)"))
    s"""WITH tok AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '') AS ts
       |  FROM documents),
       |d AS (SELECT doc_id, len(ts) AS dl, ts FROM tok),
       |t AS (SELECT doc_id, unnest(ts) AS tk FROM d),
       |h AS (SELECT doc_id, $hs AS hsg FROM t),
       |f AS (SELECT doc_id, ((hsg % $dim) + $dim) % $dim AS fi FROM h),
       |sw AS (SELECT doc_id, sum(($wl)[fi + 1]) AS s FROM f
       |  GROUP BY doc_id),
       |z AS (SELECT d.doc_id, CASE WHEN d.dl > 0
       |    THEN $bias + coalesce(sw.s, 0) / d.dl ELSE $bias END AS z
       |  FROM d LEFT JOIN sw USING (doc_id)),
       |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score
       |  FROM z)
       |SELECT doc_id, score, score >= $threshold AS keep FROM sc
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for `q_dsir_weights` — [[graft.operators.Dsir]] re-derived
    * FROM SCRATCH in SQL (independent re-derivation, not a rendering of
    * the trained model): the unigram+bigram feature stream with
    * multiplicity, FNV-1a bucket hashing, add-1-smoothed bucket counts
    * of the target (`lang = 'en'`) and raw (whole-corpus)
    * distributions, per-bucket log10 ratio rounded to 6, per-document
    * exact-DECIMAL sum rounded to 4 — the same partition-order-proof
    * accumulation discipline as the LM-score oracle. */
  def dsirOracle(dim: Int, tau: Double): String = {
    val hs = toSigned(fnvOverCp(
      "list_transform(string_split(g,''), c -> unicode(c)::HUGEINT)"))
    s"""WITH tok AS (SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '') AS ts
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, lang, unnest(ts) AS g FROM tok
       |  UNION ALL
       |  SELECT doc_id, lang, t[j] || ' ' || t[j+1] AS g
       |  FROM (SELECT doc_id, lang, ts AS t,
       |      unnest(range(1, len(ts))) AS j FROM tok)),
       |hx AS MATERIALIZED (SELECT doc_id, lang,
       |    (($hs % $dim) + $dim) % $dim AS b
       |  FROM grams),
       |cp AS (SELECT b, count(*) AS c FROM hx WHERE lang = 'en'
       |  GROUP BY b),
       |cq AS (SELECT b, count(*) AS c FROM hx GROUP BY b),
       |tp AS (SELECT sum(c)::DOUBLE + $dim AS t FROM cp),
       |tq AS (SELECT sum(c)::DOUBLE + $dim AS t FROM cq),
       |ratio AS (SELECT b,
       |    round(log10((coalesce(cp.c, 0) + 1) / (SELECT t FROM tp))
       |      - log10((coalesce(cq.c, 0) + 1) / (SELECT t FROM tq)),
       |      6) AS lr
       |  FROM (SELECT unnest(range(0, $dim)) AS b) buckets
       |  LEFT JOIN cp USING (b) LEFT JOIN cq USING (b)),
       |per AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_feats,
       |    CAST(round(sum(CAST(lr AS DECIMAL(18,6))), 4) AS DOUBLE)
       |      AS log_w
       |  FROM hx JOIN ratio USING (b) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(per.n_feats, 0) AS n_feats,
       |  coalesce(per.log_w, 0.0) AS log_w,
       |  coalesce(per.log_w, 0.0) >= $tau AS keep
       |FROM documents d LEFT JOIN per USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Oracle for `q_shuffle_shards` —
    * [[graft.operators.CorpusOps.shuffleShards]]: signed
    * `xxhash64(doc_id)` (seed 42, same chain as the sampling
    * oracles), `shard = pmod(hash, n)`, and the 1-based rank inside
    * each shard in `(hash, doc_id)` order. MATERIALIZED for the same
    * chain-inlining-blowup reason as [[sampleStratifiedOracle]]. */
  def shuffleShardsOracle(numShards: Int): String = {
    val ch = new Chain("SELECT doc_id FROM documents", Seq("doc_id"))
    val xs = ch.add(toSigned(xxh64Long(ch, "doc_id")))
    s"""WITH hx AS MATERIALIZED (${ch.render()})
       |SELECT doc_id,
       |  CAST(((($xs) % $numShards) + $numShards) % $numShards
       |    AS INTEGER) AS shard,
       |  CAST(row_number() OVER (
       |    PARTITION BY ((($xs) % $numShards) + $numShards)
       |      % $numShards
       |    ORDER BY $xs, doc_id) AS INTEGER) AS pos
       |FROM hx ORDER BY shard, pos""".stripMargin
  }

  /** Oracle for `q_curriculum` — the Flesch CTEs feeding a real
    * `ntile(nStages)` over (score DESC, id), then the rendered
    * xxhash64 within-stage order (the shuffleShards chain). */
  def curriculumOracle(nStages: Int): String = {
    val flesch =
      """SELECT doc_id, CAST(206835 - (1015 * n_words) // n_sentences
        | - (84600 * n_syllables) // n_words AS BIGINT) AS fre_milli
        |FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |   CAST(sents AS BIGINT) AS n_sentences,
        |   CAST(list_sum(list_transform(ws, w -> greatest(1,
        |     len(regexp_extract_all(w, '[aeiouy]+'))))) AS BIGINT)
        |     AS n_syllables
        | FROM (SELECT doc_id,
        |     list_filter(regexp_split_to_array(lower(text), '\s+'),
        |       t -> t <> '') AS ws,
        |     greatest(1, len(regexp_extract_all(text, '[.!?]+')))
        |       AS sents
        |   FROM documents) WHERE len(ws) >= 1)"""
        .stripMargin.replace("\n", " ")
    val ch = new Chain(flesch, Seq("doc_id", "fre_milli"))
    val xs = ch.add(toSigned(xxh64Long(ch, "doc_id")))
    s"""WITH hx AS MATERIALIZED (${ch.render()}),
       |st AS (SELECT doc_id, fre_milli, $xs AS xs,
       |    ntile($nStages) OVER (ORDER BY fre_milli DESC, doc_id)
       |      AS stage
       |  FROM hx)
       |SELECT doc_id, fre_milli, CAST(stage AS BIGINT) AS stage,
       |  CAST(row_number() OVER (PARTITION BY stage
       |    ORDER BY xs, doc_id) AS BIGINT) AS pos
       |FROM st ORDER BY stage, pos""".stripMargin
  }

  /** The shared CTE chain replicating [[graft.operators.Bpe.train]]
    * IN SQL, k merge iterations unrolled: `words` (the corpus word
    * counts under the trainer's `^[a-z0-9]+$` pre-tokenizer gate),
    * `r0` (chars joined by two spaces, one-space pad), then per
    * iteration `p{i}` (per-adjacency pair counts weighted by word
    * frequency), `t{i}` (argmax pair, ties lexicographic) and
    * `r{i+1}` (the leftmost-non-overlapping `replace` rewrite — same
    * semantics in DuckDB and the JVM). Every stage is MATERIALIZED:
    * `r{i}` is referenced twice (pair count + next rewrite), so
    * single-use inlining would otherwise make the plan exponential
    * in k. This is a fully independent SQL re-derivation of the
    * training loop, not a rendering of the learned model. */
  private def bpeCtes(k: Int): String = {
    val head = Seq(
      """words AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'),
        |      t -> t <> '')) AS w
        |    FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w)"""
        .stripMargin,
      """r0 AS MATERIALIZED (
        |  SELECT w, cnt, ' ' || array_to_string(
        |    list_filter(string_split(w, ''), c -> c <> ''), '  ')
        |    || ' ' AS rep
        |  FROM words)""".stripMargin)
    val steps = (0 until k).flatMap { i =>
      Seq(
        s"""p$i AS MATERIALIZED (
           |  SELECT t[j] AS l, t[j+1] AS r, sum(cnt) AS c FROM (
           |    SELECT cnt, string_split(trim(rep), '  ') AS t,
           |      unnest(range(1, len(string_split(trim(rep), '  '))))
           |        AS j
           |    FROM r$i)
           |  GROUP BY 1, 2)""".stripMargin,
        s"""t$i AS MATERIALIZED (
           |  SELECT l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1)"""
          .stripMargin,
        s"""r${i + 1} AS MATERIALIZED (
           |  SELECT w, cnt, replace(rep,
           |    ' ' || (SELECT l FROM t$i) || '  ' ||
           |      (SELECT r FROM t$i) || ' ',
           |    ' ' || (SELECT l FROM t$i) ||
           |      (SELECT r FROM t$i) || ' ') AS rep
           |  FROM r$i)""".stripMargin)
    }
    (head ++ steps).mkString(",\n")
  }

  /** Oracle for `q_bpe_train`: the k-merge table the unrolled SQL
    * trainer derives — `(merge_rank, left_tok, right_tok, merged)`. */
  def bpeTrainOracle(k: Int): String = {
    val rows = (0 until k).map { i =>
      s"SELECT ${i + 1} AS merge_rank, l AS left_tok, r AS right_tok," +
        s" l || r AS merged FROM t$i"
    }.mkString("\nUNION ALL ")
    s"WITH ${bpeCtes(k)}\nSELECT * FROM ($rows) ORDER BY merge_rank"
  }

  /** Oracle for `q_wordpiece_encode`: re-derive the k merges (same
    * CTEs as the BPE trainer oracle — the vocab is the merge
    * outputs), then segment every DISTINCT word by `steps` unrolled
    * greedy longest-match iterations: per step, the taken length is
    * `greatest(1, CASE ... len(piece_i) ...)` over the k vocab
    * pieces prefix-matching the remaining suffix; finally words
    * rejoin their document positions and flatten in order. `steps`
    * must be >= the corpus's longest trainable word (1-char minimum
    * advance drains it). */
  def wordpieceEncodeOracle(k: Int, steps: Int,
      headTokens: Int = 20): String = {
    val pats = "pats AS MATERIALIZED (SELECT " +
      (0 until k).map(i =>
        s"(SELECT l || r FROM t$i) AS v$i").mkString(", ") + ")"
    val tk = "greatest(1, " + (0 until k).map(i =>
      s"CASE WHEN substr(rest, 1, length(v$i)) = v$i" +
        s" THEN length(v$i) ELSE 1 END").mkString(", ") + ")"
    val gsteps = (0 until steps).map { i =>
      s"""g${i + 1} AS (
         |  SELECT w, ${(0 until k).map(j => s"v$j").mkString(", ")},
         |    CASE WHEN rest = '' THEN acc
         |         ELSE list_append(acc, substr(rest, 1, tk)) END AS acc,
         |    CASE WHEN rest = '' THEN ''
         |         ELSE substr(rest, tk + 1) END AS rest
         |  FROM (SELECT *, $tk AS tk FROM g$i))""".stripMargin
    }.mkString(",\n")
    // built by CONCATENATION, not one stripMargin: bpeCtes contains
    // lines whose first non-blank chars are the `||` concat operator
    // (see bpeEncodeOracle's note) — stripMargin would eat one pipe
    "WITH " + bpeCtes(k) + ",\n" + pats + ",\n" +
      s"""docws AS (SELECT doc_id,
         |    list_filter(
         |      list_filter(regexp_split_to_array(lower(text), '\\s+'),
         |        t -> t <> ''),
         |      w2 -> regexp_matches(w2, '^[a-z0-9]+$$')) AS ws
         |  FROM documents),
         |g0 AS (SELECT w, pats.*, CAST([] AS VARCHAR[]) AS acc,
         |    w AS rest
         |  FROM (SELECT DISTINCT unnest(ws) AS w FROM docws), pats)"""
        .stripMargin + ",\n" + gsteps + ",\n" +
      s"""seg AS (SELECT w, acc FROM g$steps),
         |occ AS (SELECT doc_id, i AS widx, ws[i] AS w
         |  FROM docws, unnest(generate_series(1,
         |    greatest(len(ws), 0))) AS u(i)),
         |enc0 AS (SELECT occ.doc_id,
         |    flatten(list(seg.acc ORDER BY occ.widx)) AS toks
         |  FROM occ JOIN seg USING (w) GROUP BY occ.doc_id),
         |enc AS (SELECT d.doc_id,
         |    coalesce(e.toks, CAST([] AS VARCHAR[])) AS toks
         |  FROM documents d LEFT JOIN enc0 e USING (doc_id))
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  array_to_string(toks[1:$headTokens], ' ') AS head_tokens
         |FROM enc ORDER BY doc_id""".stripMargin
  }

  /** Oracle for `q_bpe_encode`: re-derive the k merges (same CTEs),
    * collect them into one `pats` row, then encode every document —
    * per word, the char rep folded through the k replaces in rank
    * order, split back to symbols, flattened in document order. */
  def bpeEncodeOracle(k: Int, headTokens: Int = 20): String = {
    val pats = "pats AS MATERIALIZED (SELECT " +
      (0 until k).map(i =>
        s"(SELECT l FROM t$i) AS l$i, (SELECT r FROM t$i) AS r$i")
        .mkString(", ") + ")"
    val rep0 = "' ' || array_to_string(list_filter(string_split(w, '')," +
      " c -> c <> ''), '  ') || ' '"
    val folded = (0 until k).foldLeft(rep0) { (acc, i) =>
      s"replace($acc, ' ' || l$i || '  ' || r$i || ' '," +
        s" ' ' || l$i || r$i || ' ')"
    }
    // NOTE built by concatenation, NOT one interpolated stripMargin:
    // the interpolated CTE chain contains lines whose first non-blank
    // chars are the `||` concat operator, and stripMargin would eat
    // one pipe.
    "WITH " + bpeCtes(k) + ",\n" + pats + ",\n" +
      ("""enc AS (
         |  SELECT doc_id, flatten(list_transform(
         |    list_filter(
         |      list_filter(regexp_split_to_array(lower(text), '\s+'),
         |        t -> t <> ''),
         |      w2 -> regexp_matches(w2, '^[a-z0-9]+$')),
         |    w -> string_split(trim(""".stripMargin + folded +
        s"""), '  '))) AS toks
           |  FROM documents, pats)
           |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |  array_to_string(toks[1:$headTokens], ' ') AS head_tokens
           |FROM enc ORDER BY doc_id""".stripMargin)
  }

  /** Oracle for `q_tok_fertility` — the same replayed BPE encode as
    * [[bpeEncodeOracle]], rolled up into per-doc fertility and
    * compression ratios (1e3 scale, floored). */
  def bpeFertilityOracle(k: Int): String = {
    val pats = "pats AS MATERIALIZED (SELECT " +
      (0 until k).map(i =>
        s"(SELECT l FROM t$i) AS l$i, (SELECT r FROM t$i) AS r$i")
        .mkString(", ") + ")"
    val rep0 = "' ' || array_to_string(list_filter(string_split(w, '')," +
      " c -> c <> ''), '  ') || ' '"
    val folded = (0 until k).foldLeft(rep0) { (acc, i) =>
      s"replace($acc, ' ' || l$i || '  ' || r$i || ' '," +
        s" ' ' || l$i || r$i || ' ')"
    }
    "WITH " + bpeCtes(k) + ",\n" + pats + ",\n" +
      ("""ew AS (SELECT doc_id, list_filter(
         |    list_filter(regexp_split_to_array(lower(text), '\s+'),
         |      t -> t <> ''),
         |    w2 -> regexp_matches(w2, '^[a-z0-9]+$')) AS ws
         |  FROM documents),
         |enc AS (
         |  SELECT doc_id, flatten(list_transform(ws,
         |    w -> string_split(trim(""".stripMargin + folded +
        """), '  '))) AS toks
          |  FROM ew, pats),
          |m AS (SELECT e.doc_id,
          |    CAST(len(w.ws) AS BIGINT) AS n_words,
          |    CAST(list_sum(list_transform(w.ws, x -> length(x)))
          |      AS BIGINT) AS n_chars,
          |    CAST(len(e.toks) AS BIGINT) AS n_tokens
          |  FROM enc e JOIN ew w USING (doc_id)
          |  WHERE len(w.ws) >= 1 AND len(e.toks) >= 1)
          |SELECT doc_id, n_words, n_chars, n_tokens,
          |  CAST((n_chars * 1000) // n_tokens AS BIGINT)
          |    AS chars_per_token_e3,
          |  CAST((n_tokens * 1000) // n_words AS BIGINT)
          |    AS tokens_per_word_e3
          |FROM m ORDER BY doc_id""".stripMargin)
  }

  // ───────────── unigram-LM tokenizer (Kudo 2018, hard EM) ─────────────
  //
  // Independent re-derivation of graft.operators.Unigram: seed counts
  // over all ≤4-char substrings of the eligible words, `iters`
  // Viterbi-EM rounds (each an UNROLLED integer DP over `dpStages`
  // word positions plus an unrolled backtrace), Laplace-smoothed
  // integer micro-nat scores `round(ln((c+1)/(T+V))*1e6)`, final vocab
  // = top-`vocabSize` pieces by (count DESC, piece ASC) ∪ all single
  // characters. `dpStages` must be ≥ the longest eligible word (the
  // same static-unroll contract as wordpieceEncodeOracle's `steps`).
  // DP ties break by (score DESC, pieces ASC, last-piece-length DESC)
  // — bl is distinct per candidate, so row_number()=1 is unique and
  // the DP (hence the whole training) is deterministic.

  /** One Viterbi pass (unrolled DP + backtrace) against score CTE
    * `sc`, producing emission CTE `em$tag` with `(w, j, piece)` rows
    * (`j` ascending = left-to-right pieces). */
  private def unigramViterbiCtes(tag: String, sc: String,
      dpStages: Int): String = {
    val pp =
      s"""upp$tag AS MATERIALIZED (SELECT p.w, p.i, p.l, s.s
         |  FROM upos p JOIN $sc s USING (piece))""".stripMargin
    val dp0 =
      s"""udpu${tag}_0 AS (SELECT w, 0 AS j, CAST(0 AS BIGINT) AS score,
         |  0 AS np, 0 AS bl FROM uwords)""".stripMargin
    val dps = (1 to dpStages).flatMap { j =>
      Seq(
        s"""udp${tag}_$j AS MATERIALIZED (
           |  SELECT w, j, score, np, bl FROM (
           |    SELECT p.w, $j AS j, d.score + p.s AS score,
           |      d.np + 1 AS np, p.l AS bl,
           |      row_number() OVER (PARTITION BY p.w
           |        ORDER BY d.score + p.s DESC, d.np + 1 ASC,
           |          p.l DESC) AS rn
           |    FROM upp$tag p JOIN udpu${tag}_${j - 1} d
           |      ON p.w = d.w AND d.j = $j - p.l
           |    WHERE p.i = $j - p.l + 1 AND $j <= length(p.w))
           |  WHERE rn = 1)""".stripMargin,
        s"""udpu${tag}_$j AS MATERIALIZED (
           |  SELECT * FROM udpu${tag}_${j - 1}
           |  UNION ALL SELECT * FROM udp${tag}_$j)""".stripMargin)
    }
    val bt0 =
      s"""ubt${tag}_0 AS (SELECT w, length(w) AS j,
         |  CAST(NULL AS VARCHAR) AS piece FROM uwords)""".stripMargin
    val bts = (1 to dpStages).map { k =>
      s"""ubt${tag}_$k AS MATERIALIZED (
         |  SELECT b.w, b.j - d.bl AS j,
         |    substr(b.w, b.j - d.bl + 1, d.bl) AS piece
         |  FROM ubt${tag}_${k - 1} b
         |  JOIN udpu${tag}_$dpStages d ON d.w = b.w AND d.j = b.j
         |  WHERE b.j > 0)""".stripMargin
    }
    val em =
      s"uem$tag AS (" + (1 to dpStages).map(k =>
        s"SELECT w, j, piece FROM ubt${tag}_$k")
        .mkString("\nUNION ALL ") + ")"
    (Seq(pp, dp0) ++ dps ++ Seq(bt0) ++ bts :+ em).mkString(",\n")
  }

  /** The shared training chain: words → substring seed → sc0 → `iters`
    * EM rounds → `ukeep`/`umodel` (kept pieces with final counts and
    * re-smoothed scores, ranked). */
  private def unigramCtes(iters: Int, dpStages: Int,
      vocabSize: Int): String = {
    val head = Seq(
      """uwords AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'),
        |      t -> t <> '')) AS w
        |    FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w)"""
        .stripMargin,
      """upos AS MATERIALIZED (
        |  SELECT w, cnt, i, l, substr(w, i, l) AS piece
        |  FROM uwords,
        |    unnest(generate_series(1, length(w))) AS u(i),
        |    unnest(generate_series(1, 4)) AS v(l)
        |  WHERE i + l - 1 <= length(w))""".stripMargin,
      """useed AS MATERIALIZED (
        |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM upos GROUP BY piece)""".stripMargin,
      """usc0 AS MATERIALIZED (
        |  SELECT piece, CAST(round(ln((c + 1.0) /
        |    ((SELECT sum(c) FROM useed) +
        |     (SELECT count(*) FROM useed))) * 1000000) AS BIGINT) AS s
        |  FROM useed)""".stripMargin)
    val rounds = (0 until iters).flatMap { r =>
      Seq(
        unigramViterbiCtes(s"t$r", s"usc$r", dpStages),
        s"""ucnt${r + 1} AS MATERIALIZED (
           |  SELECT piece, CAST(sum(uwords.cnt) AS BIGINT) AS c
           |  FROM uemt$r JOIN uwords USING (w) GROUP BY piece)"""
          .stripMargin,
        s"""usc${r + 1} AS MATERIALIZED (
           |  SELECT sd.piece, CAST(round(ln((coalesce(c.c, 0) + 1.0) /
           |    ((SELECT coalesce(sum(c), 0) FROM ucnt${r + 1}) +
           |     (SELECT count(*) FROM useed))) * 1000000) AS BIGINT)
           |    AS s
           |  FROM useed sd LEFT JOIN ucnt${r + 1} c USING (piece))"""
          .stripMargin)
    }
    val keep = Seq(
      s"""utopk AS (SELECT piece, c FROM ucnt$iters
         |  ORDER BY c DESC, piece LIMIT $vocabSize)""".stripMargin,
      """uchars AS (SELECT DISTINCT substr(w, i, 1) AS piece
        |  FROM uwords,
        |    unnest(generate_series(1, length(w))) AS u(i))"""
        .stripMargin,
      s"""ukeep AS MATERIALIZED (SELECT piece, max(c) AS c FROM (
         |    SELECT piece, c FROM utopk
         |    UNION ALL
         |    SELECT ch.piece, coalesce(c.c, 0) AS c FROM uchars ch
         |      LEFT JOIN ucnt$iters c USING (piece))
         |  GROUP BY piece)""".stripMargin,
      """umodel AS MATERIALIZED (SELECT piece, c,
        |    CAST(round(ln((c + 1.0) /
        |      ((SELECT sum(c) FROM ukeep) +
        |       (SELECT count(*) FROM ukeep))) * 1000000) AS BIGINT)
        |      AS s,
        |    row_number() OVER (ORDER BY c DESC, piece) AS rank
        |  FROM ukeep)""".stripMargin)
    (head ++ rounds ++ keep).mkString(",\n")
  }

  /** Oracle for `q_unigram_train`: the ranked kept-piece table
    * `(rank, piece, cnt, score)` the unrolled hard-EM derives. */
  def unigramTrainOracle(iters: Int, dpStages: Int,
      vocabSize: Int): String =
    "WITH " + unigramCtes(iters, dpStages, vocabSize) + "\n" +
      """SELECT CAST(rank AS BIGINT) AS rank, piece,
        |  c AS cnt, s AS score
        |FROM umodel ORDER BY rank""".stripMargin

  /** Oracle for `q_unigram_encode`: one more Viterbi pass under the
    * kept-model scores, then the per-document flatten of
    * wordpieceEncodeOracle (words rejoin their positions, pieces in
    * left-to-right order). */
  def unigramEncodeOracle(iters: Int, dpStages: Int, vocabSize: Int,
      headTokens: Int = 20): String =
    "WITH " + unigramCtes(iters, dpStages, vocabSize) + ",\n" +
      "uscm AS (SELECT piece, s FROM umodel),\n" +
      unigramViterbiCtes("e", "uscm", dpStages) + ",\n" +
      unigramEncodeTail("e", headTokens)

  /** Per-document flatten of a Viterbi segmentation (`uem$tag` from
    * [[unigramViterbiCtes]]): words rejoin their positions, pieces in
    * left-to-right order, docs with no eligible words keep an empty
    * token list. Ends in the final SELECT. */
  private def unigramEncodeTail(tag: String, headTokens: Int): String =
    s"""useg$tag AS (SELECT w, list(piece ORDER BY j) AS acc
       |  FROM uem$tag GROUP BY w),
       |udocws$tag AS (SELECT doc_id,
       |    list_filter(
       |      list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |        t -> t <> ''),
       |      w2 -> regexp_matches(w2, '^[a-z0-9]+$$')) AS ws
       |  FROM documents),
       |uocc$tag AS (SELECT doc_id, i AS widx, ws[i] AS w
       |  FROM udocws$tag, unnest(generate_series(1,
       |    greatest(len(ws), 0))) AS u(i)),
       |uenc0$tag AS (SELECT uocc$tag.doc_id,
       |    flatten(list(useg$tag.acc ORDER BY uocc$tag.widx)) AS toks
       |  FROM uocc$tag JOIN useg$tag USING (w)
       |  GROUP BY uocc$tag.doc_id),
       |uenc$tag AS (SELECT d.doc_id,
       |    coalesce(e.toks, CAST([] AS VARCHAR[])) AS toks
       |  FROM documents d LEFT JOIN uenc0$tag e USING (doc_id))
       |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       |  array_to_string(toks[1:$headTokens], ' ') AS head_tokens
       |FROM uenc$tag ORDER BY doc_id""".stripMargin

  // ───────── unigram-LM tokenizer, SOFT EM (forward-backward) ─────────
  //
  // Independent re-derivation of graft.operators.Unigram.trainSoft
  // under the quantized-expectation integer contract: piece weights
  // q = max(1, halfup(256·(c+s)/(T+V·s))) in pure integer arithmetic,
  // forward/backward DP sums of weight products in HUGEINT (bounded by
  // 260^13·1e6 < 10^38 for ≤`dpStages`-char words), micro-expectations
  // ec = (A(i-1)·q·B(n-i-l+1)·1e6) // A(n) with exact integral
  // division, M-step micro counts Σ cnt·ec, kept vocab by
  // (c DESC, piece ASC) ∪ single chars, final scores
  // round(ln((c+1e6)/(T'+V'·1e6))·1e6).

  /** One soft round `r`: weights CTE `uqw$r` is assumed defined;
    * produces `ucntS${r + 1}` micro counts. */
  private def unigramSoftRoundCtes(r: Int, dpStages: Int): String = {
    val fq =
      s"""ufq$r AS MATERIALIZED (SELECT p.w, p.cnt, p.i, p.l,
         |  p.piece, q.q FROM upos p JOIN uqw$r q USING (piece))"""
        .stripMargin
    val fw0 =
      s"""ufwu${r}_0 AS (SELECT w, 0 AS j,
         |  CAST(1 AS HUGEINT) AS a FROM uwords)""".stripMargin
    val fws = (1 to dpStages).flatMap { j =>
      Seq(
        s"""ufw${r}_$j AS MATERIALIZED (
           |  SELECT p.w, $j AS j, sum(d.a * CAST(p.q AS HUGEINT)) AS a
           |  FROM ufq$r p JOIN ufwu${r}_${j - 1} d
           |    ON p.w = d.w AND d.j = $j - p.l
           |  WHERE p.i = $j - p.l + 1 AND $j <= length(p.w)
           |  GROUP BY p.w)""".stripMargin,
        s"""ufwu${r}_$j AS MATERIALIZED (
           |  SELECT * FROM ufwu${r}_${j - 1}
           |  UNION ALL SELECT * FROM ufw${r}_$j)""".stripMargin)
    }
    val bw0 =
      s"""ubwu${r}_0 AS (SELECT w, 0 AS m,
         |  CAST(1 AS HUGEINT) AS b FROM uwords)""".stripMargin
    val bws = (1 to dpStages).flatMap { m =>
      Seq(
        s"""ubw${r}_$m AS MATERIALIZED (
           |  SELECT p.w, $m AS m, sum(CAST(p.q AS HUGEINT) * d.b) AS b
           |  FROM ufq$r p JOIN ubwu${r}_${m - 1} d
           |    ON p.w = d.w AND d.m = $m - p.l
           |  WHERE p.i = length(p.w) - $m + 1 AND $m <= length(p.w)
           |  GROUP BY p.w)""".stripMargin,
        s"""ubwu${r}_$m AS MATERIALIZED (
           |  SELECT * FROM ubwu${r}_${m - 1}
           |  UNION ALL SELECT * FROM ubw${r}_$m)""".stripMargin)
    }
    val ex =
      s"""uex$r AS MATERIALIZED (
         |  SELECT p.piece, p.cnt,
         |    (fa.a * CAST(p.q AS HUGEINT) * fb.b * 1000000)
         |      // fan.a AS ec
         |  FROM ufq$r p
         |  JOIN ufwu${r}_$dpStages fa
         |    ON fa.w = p.w AND fa.j = p.i - 1
         |  JOIN ubwu${r}_$dpStages fb
         |    ON fb.w = p.w AND fb.m = length(p.w) - p.i - p.l + 1
         |  JOIN ufwu${r}_$dpStages fan
         |    ON fan.w = p.w AND fan.j = length(p.w))""".stripMargin
    val cnt =
      s"""ucntS${r + 1} AS MATERIALIZED (
         |  SELECT piece, CAST(sum(cnt * ec) AS BIGINT) AS c
         |  FROM uex$r GROUP BY piece)""".stripMargin
    (Seq(fq, fw0) ++ fws ++ Seq(bw0) ++ bws ++ Seq(ex, cnt))
      .mkString(",\n")
  }

  /** Oracle for `q_unigram_train_soft`: the ranked kept-piece table
    * `(rank, piece, cnt, score)` with cnt in MICRO-expectations. */
  def unigramSoftTrainOracle(iters: Int, dpStages: Int,
      vocabSize: Int): String =
    "WITH " + unigramSoftCtes(iters, dpStages, vocabSize) + "\n" +
      """SELECT CAST(rank AS BIGINT) AS rank, piece,
        |  c AS cnt, s AS score
        |FROM umodelS ORDER BY rank""".stripMargin

  /** The full soft-EM training pipeline as CTEs ending in `umodelS`
    * (piece, c, s, rank) — shared by the soft train and encode
    * oracles. Also defines `uwords`/`upos`, which
    * [[unigramViterbiCtes]] consumes. */
  private def unigramSoftCtes(iters: Int, dpStages: Int,
      vocabSize: Int): String = {
    val head = Seq(
      """uwords AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'),
        |      t -> t <> '')) AS w
        |    FROM documents)
        |  WHERE regexp_matches(w, '^[a-z0-9]+$') GROUP BY w)"""
        .stripMargin,
      """upos AS MATERIALIZED (
        |  SELECT w, cnt, i, l, substr(w, i, l) AS piece
        |  FROM uwords,
        |    unnest(generate_series(1, length(w))) AS u(i),
        |    unnest(generate_series(1, 4)) AS v(l)
        |  WHERE i + l - 1 <= length(w))""".stripMargin,
      """useed AS MATERIALIZED (
        |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
        |  FROM upos GROUP BY piece)""".stripMargin)
    def weights(r: Int, countsCte: String, scale: Long) =
      s"""uqw$r AS MATERIALIZED (
         |  SELECT sd.piece, greatest(1,
         |    (2*256*(coalesce(c.c, 0) + $scale) +
         |     ((SELECT coalesce(sum(c), 0) FROM $countsCte) +
         |      (SELECT count(*) FROM useed) * $scale))
         |    // (2*((SELECT coalesce(sum(c), 0) FROM $countsCte) +
         |         (SELECT count(*) FROM useed) * $scale))) AS q
         |  FROM useed sd LEFT JOIN $countsCte c USING (piece))"""
        .stripMargin
    val rounds = (0 until iters).flatMap { r =>
      val (cte, scale) =
        if (r == 0) ("useed", 1L) else (s"ucntS$r", 1000000L)
      Seq(weights(r, cte, scale), unigramSoftRoundCtes(r, dpStages))
    }
    val keep = Seq(
      s"""utopkS AS (SELECT piece, c FROM ucntS$iters
         |  ORDER BY c DESC, piece LIMIT $vocabSize)""".stripMargin,
      """ucharsS AS (SELECT DISTINCT substr(w, i, 1) AS piece
        |  FROM uwords,
        |    unnest(generate_series(1, length(w))) AS u(i))"""
        .stripMargin,
      s"""ukeepS AS MATERIALIZED (SELECT piece, max(c) AS c FROM (
         |    SELECT piece, c FROM utopkS
         |    UNION ALL
         |    SELECT ch.piece, coalesce(c.c, 0) AS c FROM ucharsS ch
         |      LEFT JOIN ucntS$iters c USING (piece))
         |  GROUP BY piece)""".stripMargin,
      """umodelS AS MATERIALIZED (SELECT piece, c,
        |    CAST(round(ln((c + 1000000.0) /
        |      ((SELECT sum(c) FROM ukeepS) +
        |       (SELECT count(*) FROM ukeepS) * 1000000.0)) * 1000000)
        |      AS BIGINT) AS s,
        |    row_number() OVER (ORDER BY c DESC, piece) AS rank
        |  FROM ukeepS)""".stripMargin)
    (head ++ rounds ++ keep).mkString(",\n")
  }

  /** Oracle for `q_unigram_encode_soft`: Viterbi encode under the
    * SOFT-trained model's scores — the soft pipeline's `umodelS`
    * feeds the same segment-and-flatten tail the hard encode oracle
    * uses. */
  def unigramEncodeSoftOracle(iters: Int, dpStages: Int,
      vocabSize: Int, headTokens: Int = 20): String =
    "WITH " + unigramSoftCtes(iters, dpStages, vocabSize) + ",\n" +
      "uscmS AS (SELECT piece, s FROM umodelS),\n" +
      unigramViterbiCtes("es", "uscmS", dpStages) + ",\n" +
      unigramEncodeTail("es", headTokens)
}
