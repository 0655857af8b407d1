package graft

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis, Vectors}
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Extension operators: dedup family, similarity search, text analysis,
  * multimodal plumbing — over the driver's synthetic documents/embeddings.
  */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("exact dedup by word-set fingerprint finds planted reordered copies") {
    val summary = Dedup.exactSummary(docs, Dedup.wordSetFingerprint(col("text")), col("doc_id"))
    val nKeys = summary.count()
    val dupKeys = summary.filter(col("n_dups") > 1).count()
    assert(nKeys < docs.count(), "must find at least one duplicate cluster")
    assert(dupKeys > 0)
    // representatives keep exactly one row per key
    val kept = Dedup.exactDedup(docs, Seq(Dedup.wordSetFingerprint(col("text"))), col("doc_id"))
    assert(kept.count() == nKeys)
  }

  test("minhash LSH finds the planted near-duplicate pairs with high estimated jaccard") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text").collect()
    assert(pairs.length > 0, "documents contain planted near-dups (jaccard≈0.99)")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
    // the known top pair from exact analysis must be found
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.exists { case (a, b) => a != b })
    // dedup drops exactly the larger-id side of each pair
    val deduped = Dedup.minhashDedup(docs, "doc_id", "text")
    val losers = pairs.map(_.getLong(1)).toSet
    assert(deduped.count() == docs.count() - losers.size)
  }

  test("minhash estimated jaccard tracks exact ngram jaccard on found pairs") {
    val est = Dedup.minhashPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = est.keySet intersect exact.keySet
    assert(common.nonEmpty)
    common.foreach { k => assert(math.abs(est(k) - exact(k)) < 0.3, s"pair $k: est=${est(k)} exact=${exact(k)}") }
  }

  test("simhash expression is deterministic and near-dups have small hamming distance") {
    Hashing.register(spark)
    assert(Hashing.simhash64("the quick brown fox") == Hashing.simhash64("the quick brown fox"))
    // permuted text has IDENTICAL simhash (bag-of-words based)
    assert(Hashing.simhash64("a b c d e") == Hashing.simhash64("e d c b a"))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
    assert(pairs.count() > 0)
    // sanity on one known near-dup from minhash
    val mh = Dedup.minhashPairs(docs, "doc_id", "text").limit(1).collect()
    if (mh.nonEmpty) {
      val (a, b) = (mh(0).getLong(0), mh(0).getLong(1))
      val hs = Dedup.simhashes(docs, "doc_id", "text").filter(col("id").isin(a, b))
        .collect().map(_.getLong(1))
      assert(java.lang.Long.bitCount(hs(0) ^ hs(1)) <= 16)
    }
  }

  test("embedding LSH near-dup pairs match brute-force above threshold") {
    val brute = emb.alias("a").crossJoin(emb.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Vectors.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("c") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH is a subset of brute force; with 16 OR-tables recall should be high
    assert(lsh.subsetOf(brute))
    if (brute.nonEmpty) assert(lsh.nonEmpty, s"LSH missed all ${brute.size} true pairs")
  }

  test("lsh bucket cap bounds candidates and keeps results a subset of uncapped") {
    val uncapped = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a tight cap must still complete and only ever LOSE pairs, never invent
    val capped = Dedup.embeddingDupPairs(emb, "vec_id", "embedding", threshold = 0.45,
      maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // same law for the minhash band-bucket cap
    val mhAll = Dedup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhCapped = Dedup.minhashPairs(docs, "doc_id", "text", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mhCapped.subsetOf(mhAll))
  }

  test("brute-force topk is exact and lsh topk is a high-recall approximation") {
    val queries = emb.filter(col("vec_id") < 8)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
    assert(bf.count() == 8 * 10)
    // ranks are 1..10 per query and scores non-increasing
    val byQuery = bf.collect().groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 10, nbits = 4)
    assert(lsh.count() > 0)
    // every lsh neighbor's score must equal the brute-force score for the
    // same (query, neighbor) — same cosine, just fewer candidates
    val bfMap = bf.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      bfMap.get(key).foreach(s => assert(math.abs(s - r.getDouble(3)) < 1e-12))
    }
  }

  test("hard negatives: top-k nearest with a different label, exact vs local mirror") {
    val anchors = emb.filter(col("vec_id") % 10 === 0)
    val hn = Similarity.hardNegatives(emb, anchors, "vec_id", "embedding", "label", 5)
    val rows = emb.select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = rows.filter(_._1 % 10 == 0).map { case (qid, qv, ql) =>
      qid -> rows.filter(r => r._3 != ql)
        .map(r => (r._1, cos(r._2, qv)))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    }.toMap
    val got = hn.collect().groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    }
    assert(got === want)
    // no returned neighbor ever shares its anchor's label (and never self)
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    hn.collect().foreach { r =>
      assert(labelOf(r.getLong(2)) != labelOf(r.getLong(0)))
      assert(r.getLong(2) != r.getLong(0))
    }
  }

  test("winnowing rolling-hash fingerprints detect shared substrings") {
    // identical text → identical fingerprint sets
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    assert(Hashing.winnowLocal(t1, 8, 16).toSeq == Hashing.winnowLocal(t1, 8, 16).toSeq)
    // a doc containing a long shared substring shares fingerprints
    val t2 = "PREFIX " + t1 + " SUFFIX"
    val shared = Hashing.winnowLocal(t1, 8, 4).toSet intersect Hashing.winnowLocal(t2, 8, 4).toSet
    assert(shared.nonEmpty)
    // expression mirrors the local implementation
    val viaDf = Seq(Tuple1(t1)).toDF("t")
      .select(Hashing.winnow(col("t"), 8, 16)).collect().head.getSeq[Long](0)
    assert(viaDf == Hashing.winnowLocal(t1, 8, 16).toSeq)
    // the planted near-dup pairs in documents are found
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text")
    assert(pairs.count() > 0)
  }

  test("text analysis: counts, ratios, fingerprint, language id") {
    val d = docs.limit(50)
    val r = d.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("nt"),
      TextAnalysis.bpeishTokenCount(col("text")).as("nb"),
      TextAnalysis.punctuationRatio(col("text")).as("pr"),
      TextAnalysis.stopwordRatio(col("text"), "en").as("sr"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
    r.foreach { row =>
      assert(row.getLong(1) > 0)
      assert(row.getDouble(3) >= 0 && row.getDouble(3) <= 1)
      assert(row.getDouble(5) >= 0 && row.getDouble(5) <= 1)
      assert(row.getString(6).length == 32)
    }
    // langId returns one of the profiled codes
    val langs = docs.select(TextAnalysis.langId(col("text"))).distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.stopwords.keySet))
  }

  test("multimodal: real header parsing — PNG/JPEG/GIF/BMP dims, WAV sample rate") {
    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      bb.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put(Array(0xff, 0xd8, 0xff, 0xc0).map(_.toByte))
      bb.putShort(0x11.toShort).put(8.toByte)
      bb.putShort(h.toShort).putShort(w.toShort)
      bb.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }
    def bmp(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes).position(18)
      bb.putInt(w).putInt(h)
      bb.array()
    }
    def wav(rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(36).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(28).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2).putInt(rate)
      bb.array()
    }
    implicit val s = spark
    val media = Seq(
      (1L, "image/png", "t", png(640, 480)),
      (2L, "image/jpeg", "t", jpeg(800, 600)),
      (3L, "image/gif", "t", gif(320, 200)),
      (4L, "image/bmp", "t", bmp(1024, 768)),
      (5L, "audio/wav", "t", wav(44100))
    ).toDF("media_id", "media_type", "source", "content")
    val metas = Multimodal.extractMeta(media).collect().map(m => m.media_id -> m).toMap
    assert(metas(1L).format == "png" && metas(1L).width == 640 && metas(1L).height == 480)
    assert(metas(2L).format == "jpeg" && metas(2L).width == 800 && metas(2L).height == 600)
    assert(metas(3L).format == "gif" && metas(3L).width == 320 && metas(3L).height == 200)
    assert(metas(4L).format == "bmp" && metas(4L).width == 1024 && metas(4L).height == 768)
    assert(metas(5L).format == "wav" && metas(5L).sample_rate == 44100)
    // the Column-side sniff agrees with the typed-path sniff
    val sniffed = media.select(col("media_id"), Multimodal.sniffFormat(col("content")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sniffed == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "bmp", 5L -> "wav"))
  }

  test("multimodal: sniff, stub decode via partition batching, frame sampling") {
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    implicit val s = spark
    val meta = Multimodal.extractMeta(media)
    val rows = meta.collect()
    assert(rows.length == docs.count())
    rows.foreach { m =>
      assert(m.n_bytes > 0 && m.format == "bin" && m.width >= 64 && m.height >= 64)
    }
    // determinism of the stubbed decode
    val again = Multimodal.extractMeta(media).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (x, y) => x == y })
    // PNG magic is sniffed
    val png = Seq((1L, "image/png", "t", Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)))
      .toDF("media_id", "media_type", "source", "content")
    assert(Multimodal.extractMeta(png).collect().head.format == "png")

    val frames = Multimodal.frameSample(media, 64, 8)
    val f = frames.collect()
    assert(f.nonEmpty)
    assert(f.forall(_.getInt(1) < 8))
    assert(f.forall(_.getInt(2) <= 64))

    // resize on undecodable payloads: byte-subsample fallback bounded by
    // the target budget, deterministic
    val resized = Multimodal.resize(media, 8, 8).collect()
    assert(resized.forall(r => r.content.length <= 64))
    assert(resized.forall(r => r.target_w == 8 && r.target_h == 8))
  }

  test("greedy subword pieces: longest-match wins, unk on uncovered chars") {
    import org.apache.spark.sql.functions._
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    def pieces(word: String, vocab: Seq[String]): Int =
      Seq(word).toDF("w")
        .select(graft.functions.Tokenize.greedyPieceCount(col("w"), vocab))
        .collect()(0).getInt(0)
    assert(pieces("unbreakable", Seq("un", "break", "able")) == 3)
    assert(pieces("zzz", Seq("un", "break")) == -1)
    // GREEDY longest: aaaa → aaa|a (2), never a|a|a|a
    assert(pieces("aaaa", Seq("a", "aa", "aaa")) == 2)
    // greedy can fail where backtracking would not: ab with {a, ab-less
    // vocab}: vocab {ab, abc... } — verify the documented greedy semantics
    assert(pieces("abc", Seq("ab", "c", "a", "bc")) == 2) // ab|c, not a|bc
    assert(pieces("", Seq("a")) == 0)
  }

  test("wordpieceStats: hand mirror incl. empty docs and unk words") {
    import org.apache.spark.sql.functions._
    val sqlImplicits = spark.implicits
    import sqlImplicits._
    // corpus where 'hello' and 'world' dominate the top-N; 'qx!' has '!'
    // outside [a-z0-9] and both words → unk
    val docs = Seq(
      (1L, "hello world hello world"),
      (2L, "helloworld q1"),
      (3L, ""),
      (4L, "qx!")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.wordpieceStats(docs, "doc_id", "text", topN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // counts: hello 2, world 2, rest 1 ⇒ top-2 vocab = {hello, world} (+ [a-z0-9])
    assert(got(1L) == ((4L, 0L, 4L)))           // four single-piece words
    assert(got(2L) == ((2L, 0L, 2L + 2L)))      // helloworld→hello|world, q1→q|1
    assert(got(3L) == ((0L, 0L, 0L)))
    assert(got(4L) == ((1L, 1L, 0L)))           // '!' uncovered → unk
  }
}
