package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, TextDedup}

/** Corpus-level operators: dedup clustering, decontamination, span dedup,
  * URL parsing. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("q_dedup_clusters labels are a fixed point and respect the edges") {
    val out = Corpus.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every edge endpoint got a label; the propagation iterates to a
    // fixed point, so both ends of every edge must agree regardless of
    // component diameter
    pairs.foreach { case (a, b) =>
      assert(out.contains(a) && out.contains(b))
      assert(out(a) == out(b), s"edge ($a,$b) straddles clusters")
    }
    // a cluster's label is the minimum id among its members
    out.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl,
        s"cluster $lbl: min member ${members.keys.min}")
    }
    // survivor flag = exactly one per cluster, the representative
    val surv = Corpus.queries("q_dedup_clusters")(spark, sf)
      .filter(col("survivor")).collect().map(_.getLong(0)).toSet
    assert(surv == out.values.toSet)
  }

  test("q_dedup_cluster_purity is consistent with q_dedup_clusters " +
      "labels and the documents source column") {
    val cl = Corpus.queries("q_dedup_clusters")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val src = Tables.table(spark, sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val expected = cl.groupBy(_._2).map { case (c, ms) =>
      val bySrc = ms.map(m => src(m._1)).groupBy(identity)
        .map { case (s, g) => s -> g.size }
      val (ds, dc) = bySrc.toSeq.sortBy(t => (-t._2, t._1)).head
      c -> (ms.length.toLong, bySrc.size.toLong, ds, dc.toLong)
    }
    val rows = Corpus.queries("q_dedup_cluster_purity")(spark, sf)
      .collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val e = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))
        == e, s"cluster ${r.getLong(0)}")
      assert(r.getDouble(5) == e._4.toDouble / e._1)
      assert(r.getBoolean(6) == (e._2 > 1L))
      assert(r.getLong(1) >= 2L, "CC clusters are pair-born")
    }
  }

  test("q_graph_kcore equals a plain-Scala peel to the true 2-core " +
      "(and the fixture converges within the 3 unrolled rounds)") {
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Scala reference: peel to the TRUE fixed point
    var edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.length != edges.length
      edges = next
      if (changed) rounds += 1
    }
    assert(rounds <= 3,
      s"fixture needs $rounds peel rounds; the declared query unrolls 3")
    val expected = edges.groupBy(_._1)
      .map { case (v, es) => v -> es.length.toLong }
    val out = Corpus.queries("q_graph_kcore")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected, s"2-core mismatch: got $out want $expected")
    out.values.foreach(d => assert(d >= 2))
  }

  test("q_graph_labelprop equals a plain-Scala 3-round synchronous " +
      "replay and labels partition the vertex set") {
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (v, ns) =>
        // neighbor votes + one self-vote; ties to the smallest label
        val votes = (ns.map(lbl) :+ lbl(v)).groupBy(identity)
          .map { case (l, vs) => (l, vs.length) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val out = Corpus.queries("q_graph_labelprop")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == lbl.keySet)
    out.foreach { r =>
      assert(r.getLong(1) == lbl(r.getLong(0)),
        s"label mismatch for node ${r.getLong(0)}")
    }
    // n_members is consistent and communities cover every vertex once
    val bySize = lbl.values.groupBy(identity).map { case (l, vs) =>
      l -> vs.size.toLong }
    out.foreach(r => assert(r.getLong(2) == bySize(r.getLong(1))))
    // propagation actually merged something (fixture has real dup pairs)
    assert(lbl.values.toSet.size < lbl.size)
  }

  test("q_graph_assortativity equals an exact BigInt replay and r is " +
      "a valid correlation") {
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = sym.groupBy(_._1).map { case (v, es) =>
      v -> BigInt(es.length) }
    val labeled = sym.map { case (a, b) => (deg(a), deg(b)) }
    val m = BigInt(labeled.length)
    val sdadb = labeled.map { case (da, db) => da * db }.sum
    val s1 = labeled.map(_._1).sum
    val s2 = labeled.map { case (da, _) => da * da }.sum
    val num = m * sdadb - s1 * s1
    val den = m * s2 - s1 * s1
    val rows = Corpus.queries("q_graph_assortativity")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == labeled.length.toLong)
    assert(BigInt(r.getString(1)) == num, "num_str")
    assert(BigInt(r.getString(2)) == den, "den_str")
    assert(den > 0, "degenerate (regular) fixture graph")
    assert(r.getDouble(3) == num.toDouble / den.toDouble)
    assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0)
  }

  test("q_source_hhi equals an exact BigInt replay and sits inside " +
      "[1/k, 1]") {
    val ns = Tables.table(spark, sf, "documents")
      .groupBy("source").count()
      .collect().map(_.getLong(1)).map(BigInt(_))
    val k = ns.length
    val n = ns.sum
    val s2 = ns.map(x => x * x).sum
    val out = Corpus.queries("q_source_hhi")(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == k.toLong && BigInt(r.getLong(1)) == n)
    assert(BigInt(r.getString(2)) == s2, "sum_sq")
    assert(r.getDouble(3) == s2.toDouble / (n * n).toDouble, "hhi")
    assert(r.getDouble(4) ==
      (k * s2 - n * n).toDouble / ((n * n) * (k - 1)).toDouble,
      "hhi_normalized")
    assert(r.getDouble(3) >= 1.0 / k && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("connectedComponents converges in O(log diameter) rounds on a " +
      "256-node path and labels it exactly") {
    // a single path 0–1–2–…–255: worst case for plain min-label
    // propagation (255 rounds); pointer doubling must finish in
    // ~log2(256) + a constant — the gate at 12 would fail any
    // linear-round regression loudly
    val path = (0L until 255L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Corpus.connectedComponentsWithRounds(path)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length == 256)
    assert(out.forall(_._2 == 0L), "path component must all label to 0")
    assert(rounds <= 12, s"took $rounds rounds — pointer doubling broken?")
    labels.unpersist()
    // two components + an isolated self-pair keep labels separated
    val multi = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 20L))
      .toDF("id_a", "id_b")
    val (l2, _) = Corpus.connectedComponentsWithRounds(multi)
    val m = l2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == 0L && m(1L) == 0L && m(2L) == 0L)
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m(20L) == 20L)
    l2.unpersist()
  }

  test("connectedComponents with a reliable checkpoint dir writes " +
      "checkpoint blocks and yields identical labels") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val path = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (l1, _) = Corpus.connectedComponentsWithRounds(path)
    val (l2, _) = Corpus.connectedComponentsWithRounds(path,
      Some(dir.toString))
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(labels(l1) == labels(l2),
      "reliable-checkpoint path must produce the exact same labeling")
    // the reliable path really did write into the checkpoint dir (the
    // executor-loss-survivable blocks localCheckpoint never produces)
    val wrote = java.nio.file.Files.walk(dir).iterator().asScala
      .exists(p => java.nio.file.Files.isRegularFile(p))
    assert(wrote, "no checkpoint files written — reliable path inactive")
    l1.unpersist(); l2.unpersist()
  }

  test("iterative graph loops size their shuffles to the dup graph, " +
      "not the session default") {
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(partsKey)
    // pin a session default well above the floor so "sized to 4"
    // cannot be the default leaking through
    spark.conf.set(partsKey, "32")
    try {
      // helper math: floor 4, linear middle, session cap
      assert(Corpus.loopShufflePartitions(spark, 0L, 10000L) == 4)
      assert(Corpus.loopShufflePartitions(spark, 50000L, 10000L) == 6)
      assert(Corpus.loopShufflePartitions(spark, Long.MaxValue / 2,
        10000L) == 32)
      // each unrolled loop's plan must carry lp-sized hash exchanges:
      // the fixture dup graph is tiny, so lp = 4 — visibly distinct
      // from the 32-partition session default in the plan text
      val sized = raw"hashpartitioning\([^)]*, 4\)".r
      Seq("q_graph_pagerank", "q_graph_kcore", "q_graph_labelprop")
        .foreach { q =>
          val plan = Corpus.queries(q)(spark, sf)
            .queryExecution.executedPlan.toString
          assert(sized.findFirstIn(plan).isDefined,
            s"$q plan has no dup-graph-sized exchange:\n$plan")
        }
    } finally spark.conf.set(partsKey, prev)
  }

  test("q_graph_pagerank matches an exact-integer Scala power iteration " +
      "and conserves rank mass") {
    val out = Corpus.queries("q_graph_pagerank")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sym = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val base = 15000000000000L / (100L * n)
    var r: Map[Long, Long] = deg.map { case (id, _) =>
      id -> 1000000000000L / n }
    for (_ <- 1 to 2) {
      val in = sym.groupBy(_._1).map { case (v, es) =>
        v -> es.map { case (_, u) => 85L * r(u) / (100L * deg(u)) }.sum
      }
      r = deg.map { case (id, _) => id -> (base + in(id)) }
    }
    assert(out.keySet == r.keySet)
    r.foreach { case (id, rank) =>
      assert(out(id) == ((deg(id), rank)), s"node $id")
    }
    // floor losses only: total mass within (nodes + edges) of 10^12
    val mass = out.values.map(_._2).sum
    assert(mass <= 1000000000000L
      && mass >= 1000000000000L - (n + sym.length + 100L))
  }

  test("q_graph_hits matches an exact-integer Scala replay of two " +
      "unrolled iterations and pins the walk-count identity") {
    val pairs = TextDedup.nearDuplicates(
        Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(1), r.getLong(0))) // src = id_b, dst = id_a
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val h1 = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val indeg = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val a1 = pairs.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => h1(e._1)).sum }
    val h2 = pairs.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => a1.getOrElse(e._2, 0L)).sum }
    val a2 = pairs.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => h2.getOrElse(e._1, 0L)).sum }
    val out = Corpus.queries("q_graph_hits")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == nodes.toSet)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == h1.getOrElse(id, 0L), s"outdeg $id")
      assert(r.getLong(2) == indeg.getOrElse(id, 0L), s"indeg $id")
      assert(r.getLong(3) == a1.getOrElse(id, 0L), s"auth1 $id")
      assert(r.getLong(4) == h2.getOrElse(id, 0L), s"hub2 $id")
      assert(r.getLong(5) == a2.getOrElse(id, 0L), s"auth2 $id")
    }
    // a1 counts length-2 directed walks ending at v: Σ_v a1(v) = Σ_u outdeg(u)²
    assert(out.map(_.getLong(3)).sum
      == h1.values.map(x => x * x).sum, "walk-count identity")
  }

  test("q_dedup_source_matrix equals a plain-Scala unordered-pair fold " +
      "and conserves the pair total") {
    import spark.implicits._
    val srcOf = Tables.table(spark, sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val pairs = TextDedup.nearDuplicates(
        Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = Corpus.queries("q_dedup_source_matrix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == expect)
    assert(out.values.sum == pairs.length.toLong)
  }

  test("q_decontaminate flags planted eval overlap and only that") {
    val out = Corpus.queries("q_decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // train split only (doc_id % 5 != 0), hits bounded by gram count
    out.foreach { case (id, nGrams, nHits, contaminated) =>
      assert(id % 5 != 0, s"eval doc $id in train output")
      assert(nHits <= nGrams)
      assert(contaminated == (nHits > 0))
    }
    // ground truth on a small slice: doc 1's grams vs the eval gram set,
    // computed independently with plain Scala
    def grams(text: String): Set[String] = {
      val t = text.split(" ")
      if (t.length < Corpus.GramTokens) Set.empty
      else t.sliding(Corpus.GramTokens).map(_.mkString(" ")).toSet
    }
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val evalGrams = docs.collect {
      case (id, tx) if id % 5 == 0 && tx != null => grams(tx)
    }.flatten.toSet
    out.foreach { case (id, _, nHits, _) =>
      val expected = grams(docs(id)).count(evalGrams.contains)
      assert(nHits == expected, s"doc $id: $nHits vs true $expected")
    }
  }

  test("q_dedup_spans drops exactly the corpus-repeated spans") {
    val out = Corpus.queries("q_dedup_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent ground truth in plain Scala
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null)
    def spans(text: String): Seq[String] =
      text.split(" ").grouped(Corpus.SpanTokens).map(_.mkString(" ")).toSeq
    val occ = docs.flatMap(d => spans(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val truth = docs.map { case (id, tx) =>
      val sp = spans(tx)
      id -> (sp.length.toLong, sp.count(s => occ(s) == 1).toLong)
    }.toMap
    out.foreach { case (id, nSpans, nKept) =>
      val (tSpans, tKept) = truth(id)
      assert(nSpans == tSpans && nKept == tKept,
        s"doc $id: ($nSpans,$nKept) vs ($tSpans,$tKept)")
    }
  }

  test("q_vocab_per_lang ids are contiguous and frequency-ordered") {
    val rows = Corpus.queries("q_vocab_per_lang")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"$lang ids not contiguous")
      // frequency non-increasing along ids; ties broken by token asc
      sorted.sliding(2).foreach {
        case Array((_, _, t1, n1), (_, _, t2, n2)) =>
          assert(n1 > n2 || (n1 == n2 && t1 < t2),
            s"$lang order broken at $t1/$t2")
        case _ =>
      }
    }
  }

  test("q_mixture_weights keep rates follow the target weights and " +
      "cap at 1") {
    val out = Corpus.queries("q_mixture_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTotal = out.map(_._3).sum
    val wTotal = out.map(_._2).sum
    out.foreach { case (src, w, nS, nKept) =>
      assert(nKept <= nS)
      // expected rate = min(1, w*N / (W*n_s)); kept count concentrates
      // around rate*n_s — md5 buckets are near-uniform, so allow a wide
      // but meaningful band (the oracle already proves exactness; this
      // test proves the SEMANTICS are a rate, not a fixed cap)
      val rate = math.min(1.0, w.toDouble * nTotal / (wTotal.toDouble * nS))
      assert(math.abs(nKept - rate * nS) <= math.max(5.0, 0.3 * nS),
        s"$src: kept $nKept of $nS at target rate $rate")
      if (rate == 1.0) assert(nKept == nS, s"$src: capped rate must keep all")
    }
  }

  test("q_label_balance keeps exactly the minority-class size per label") {
    val out = Corpus.queries("q_label_balance")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val m = out.map(_._2).min
    out.foreach { case (lbl, nTotal, nKept, _) =>
      assert(nKept == math.min(m, nTotal), s"label $lbl")
    }
    // reproducible selection: brute-force the same md5 order for one label
    val vecs = Tables.table(spark, sf, "embeddings")
      .select("vec_id", "label").as[(Long, Int)].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val lbl0 = vecs.filter(_._2 == out.head._1).map(_._1)
    val expect = lbl0.sortBy(id => (md5hex(id.toString), id))
      .take(m.toInt).sum
    assert(out.head._4 == expect, "kept-id checksum mismatch")
  }

  test("q_text_clean strips every tag and unescapes entities") {
    val out = Corpus.queries("q_text_clean")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filter(_._2 != null).toMap
    assert(out.map(_._1).toSet == docs.keySet)
    out.foreach { case (id, nTags, cleanLen, cleanMd5) =>
      // wrapper adds exactly 9 tags (div h1 /h1 p /p br span /span /div)
      assert(nTags == 9, s"doc $id: $nTags tags")
      // independent plain-Scala cleaning of the same wrapper
      val html = s"""<div class="doc" id="$id"><h1>Doc &amp; friends""" +
        s"</h1><p>${docs(id)}</p><br/><span>&copy; example&nbsp;corp" +
        "</span></div>"
      val clean = html.replaceAll("<[^>]*>", " ")
        .replace("&nbsp;", " ").replace("&amp;", "&")
        .replace("&copy;", "(c)")
        .replaceAll("\\s+", " ").trim
      assert(cleanLen == clean.length, s"doc $id clean length")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(clean.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(cleanMd5 == md, s"doc $id clean md5")
    }
  }

  test("q_source_quota keeps exactly min(20, total) per source with a " +
      "reproducible selection") {
    val out = Corpus.queries("q_source_quota")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.table(spark, sf, "documents")
      .select("source", "doc_id").as[(String, Long)].collect()
    val bySource = docs.groupBy(_._1)
    out.foreach { case (src, nTotal, nKept, keptSum) =>
      val ids = bySource(src).map(_._2)
      assert(nTotal == ids.length)
      assert(nKept == math.min(20, ids.length))
      // brute-force the same md5 ordering
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expect = ids.sortBy(id => (md5hex(id.toString), id))
        .take(20).sum
      assert(keptSum == expect, s"$src checksum")
    }
  }

  test("q_url_parse splits host/path/ref consistently") {
    val out = Corpus.queries("q_url_parse")(spark, sf).collect()
    out.foreach { r =>
      val (url, host, path, ref) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(url == s"https://$host$path?ref=$ref", s"$url parsed wrong")
      assert(host.startsWith("www.") && host.contains(".example."))
    }
  }

  test("q_corpus_curate_v2: decontamination only shrinks the curated " +
      "corpus, and eval docs never train") {
    val v1 = Corpus.queries("q_corpus_curate")(spark, sf).collect()
      .map(r => r.getAs[Long]("n_docs")).sum
    val v2rows = Corpus.queries("q_corpus_curate_v2")(spark, sf).collect()
    val v2 = v2rows.map(r => r.getAs[Long]("n_docs")).sum
    assert(v2 > 0 && v2 <= v1, s"v2 total $v2 vs v1 $v1")
    // the v2 report is non-vacuous per row
    v2rows.foreach(r => assert(r.getAs[Long]("sum_chars") > 0))
  }

  test("q_graph_bfs_layers equals a plain-Scala BFS replay (dist <= 4 " +
      "from the min-id node)") {
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seed = adj.keys.min
    val dist = scala.collection.mutable.Map(seed -> 0L)
    var frontier = Set(seed)
    for (r <- 1 to 4) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(n => dist(n) = r.toLong)
    }
    val out = Corpus.queries("q_graph_bfs_layers")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == dist.toMap, s"spark $out vs replay $dist")
    assert(out(seed) == 0L)
  }

  test("q_graph_modularity equals a plain-Scala replay and satisfies " +
      "the degree-sum identity") {
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = TextDedup.nearDuplicates(Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b")
      .collect().map(r => (docs(r.getLong(0)), docs(r.getLong(1))))
    assume(pairs.nonEmpty)
    val m = pairs.length.toLong
    val degSum = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val intra = pairs.filter(p => p._1 == p._2)
      .groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val out = Corpus.queries("q_graph_modularity")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet == degSum.keySet)
    out.foreach { r =>
      val src = r.getString(0)
      val e = intra.getOrElse(src, 0L)
      assert(r.getLong(1) == e, s"intra_edges $src")
      assert(r.getLong(2) == degSum(src), s"deg_sum $src")
      // the scaled terms are VARCHAR-routed DECIMAL(38,0) — BigInt
      // replay (4m² wraps a Long past ~1.5e9 edges, hence the route)
      assert(BigInt(r.getString(3)) ==
        BigInt(4) * BigInt(m) * BigInt(e)
          - BigInt(degSum(src)) * BigInt(degSum(src)),
        s"q_num_scaled $src")
      assert(BigInt(r.getString(4)) == BigInt(4) * BigInt(m) * BigInt(m),
        s"q_den_scaled $src")
    }
    // handshake identity: community degree sums partition 2m
    assert(out.map(_.getLong(2)).sum == 2L * m)
  }

  test("q_graph_cc_incremental equals the full-graph labels and flags " +
      "exactly the shard-containing clusters") {
    val inc = Corpus.queries("q_graph_cc_incremental")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val full = Corpus.queries("q_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc.map(r => r._1 -> r._2).toMap == full,
      "incremental labels diverge from the full-graph closure")
    val byCluster = inc.groupBy(_._2)
    inc.foreach { case (_, c, recomputed) =>
      val hasShard = byCluster(c).exists(_._1 % 7 == 0)
      assert(recomputed == hasShard, s"cluster $c recomputed flag")
    }
  }

  test("q_snapshot_ivm maintained totals equal the direct recomputation " +
      "on every source") {
    val out = Corpus.queries("q_snapshot_ivm")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ivm_matches"),
        s"source ${r.getString(0)} ivm mismatch")
      assert(r.getAs[Long]("sum_new_ivm") ==
        r.getAs[Long]("sum_new_direct"))
    }
    // the fixture must actually exercise all three delta classes
    assert(out.map(_.getAs[Long]("add_chars")).sum > 0, "no adds")
    assert(out.map(_.getAs[Long]("del_chars")).sum > 0, "no deletes")
    assert(out.map(_.getAs[Long]("rev_shift")).sum > 0, "no revisions")
  }

  test("q_dedup_url equals a plain-Scala canonicalization replay") {
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "source", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def canon(id: Long, src: String, lang: String): String = {
      val page = id % 200
      val host0 = s"www.$src.example.com"
      val host = if (id % 5 == 0) host0.toUpperCase else host0
      val q = (id % 3) match {
        case 0 => "?utm_source=feed&utm_campaign=c"
        case 1 => s"?v=${page % 4}"
        case _ => s"?utm_source=feed&utm_campaign=c&v=${page % 4}"
      }
      val url = s"https://$host/$lang/doc-$page" +
        (if (id % 2 == 0) "/" else "") + q +
        (if (id % 4 == 0) "#section2" else "")
      url.toLowerCase
        .replaceAll("#.*$", "")
        .replace("utm_source=feed&utm_campaign=c&", "")
        .replace("?utm_source=feed&utm_campaign=c", "")
        .replace("/?", "?")
        .replaceAll("/$", "")
    }
    val expect = docs.groupBy(_._2).map { case (src, rows) =>
      val canons = rows.map(r => canon(r._1, src, r._3))
      (src, (canons.length.toLong, canons.distinct.length.toLong))
    }
    val out = Corpus.queries("q_dedup_url")(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val (n, dn) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == dn &&
        r.getLong(3) == n - dn, s"source ${r.getString(0)}")
    }
    // the synthesis must actually produce duplicates somewhere
    assert(out.map(_.getLong(3)).sum > 0, "no URL duplicates synthesized")
  }

  test("q_text_boilerplate equals a plain-Scala line-frequency replay") {
    val docs = Tables.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lines(src: String, text: String): Seq[String] = {
      val toks = text.split(" ", -1)
      val chunks = (0 to (toks.length - 1) / 12)
        .map(c => toks.slice(c * 12, c * 12 + 12).mkString(" "))
      (s"home | about | contact | $src" +: chunks) :+
        s"copyright $src all rights reserved"
    }
    val bySrc = docs.groupBy(_._2)
    val out = Corpus.queries("q_text_boilerplate")(spark, sf).collect()
    assert(out.map(_.getString(0)).toSet == bySrc.keySet)
    out.foreach { r =>
      val src = r.getString(0)
      val rows = bySrc(src)
      val inst = rows.flatMap(d => lines(src, d._3).map(l => (d._1, l)))
      val ldf = inst.groupBy(_._2).map { case (l, xs) =>
        (l, xs.map(_._1).distinct.length.toLong)
      }
      val nDocs = rows.length.toLong
      def boiler(l: String) = ldf(l) * 10 >= nDocs * 3 && ldf(l) >= 5
      assert(r.getLong(1) == nDocs)
      assert(r.getLong(2) == inst.length.toLong, s"$src n_lines")
      assert(r.getLong(3) ==
        inst.map(_._2).distinct.count(boiler).toLong, s"$src boiler")
      assert(r.getLong(4) == inst.count(i => boiler(i._2)).toLong)
      assert(r.getLong(5) ==
        inst.filterNot(i => boiler(i._2)).map(_._2.length.toLong).sum,
        s"$src chars_kept")
    }
  }

  test("q_graph_degree_dist: handshake lemma against the pair count") {
    val out = Corpus.queries("q_graph_degree_dist")(spark, sf).collect()
      .map(r => (r.getAs[Long]("deg"), r.getAs[Long]("n_nodes")))
    val pairs = graft.operators.TextOps.queries("q_dedup_pairs")(spark, sf)
      .count()
    // Σ deg · n_nodes counts every edge endpoint = 2 |E|
    assert(out.map(t => t._1 * t._2).sum == 2 * pairs)
    assert(out.forall(_._1 >= 1))
  }

  test("q_corpus_curate_v3 apportions the exact budget and consumes " +
    "each source quota greedily in md5 order") {
    val out = Corpus.queries("q_corpus_curate_v3")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // Hamilton invariant: allocations sum to the budget EXACTLY
    assert(out.values.map(_._3).sum == 100000L)
    // brute-force the consumption from the shared clean frame
    val clean = Corpus.curatedClean(spark, sf)
      .selectExpr("source", "doc_id",
        "CAST(size(split(text, ' ')) AS LONG) AS n_toks",
        "md5(CAST(doc_id AS STRING)) AS h")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val bySource = clean.groupBy(_._1)
    assert(out.keySet == bySource.keySet)
    bySource.foreach { case (src, docs) =>
      val (nd, nt, alloc, kd, kt) = out(src)
      assert(nd == docs.length.toLong, s"$src clean docs")
      assert(nt == docs.map(_._3).sum, s"$src clean tokens")
      var cum = 0L; var ekd = 0L; var ekt = 0L
      docs.sortBy(x => (x._4, x._2)).foreach { x =>
        cum += x._3
        if (cum <= alloc) { ekd += 1; ekt += x._3 }
      }
      assert(kd == ekd && kt == ekt, s"$src consumption")
      assert(kt <= alloc, s"$src quota respected")
    }
  }

  test("q_graph_clustering_coeff matches brute-force triangle and " +
    "wedge counts") {
    val r = Corpus.queries("q_graph_clustering_coeff")(spark, sf)
      .collect().head
    val pairs = TextDedup.nearDuplicates(
        Tables.table(spark, sf, "documents"))
      .select("id_a", "id_b").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val edgeSet = pairs.toSet
    val tris = pairs.toSeq.flatMap { case (a, b) =>
      (nbrs(a) & nbrs(b)).filter(c => c > b && edgeSet((b, c)) &&
        edgeSet((a, c)))
    }.size.toLong
    val wedges = nbrs.values.map(s0 =>
      s0.size.toLong * (s0.size - 1) / 2).sum
    assert(r.getLong(0) == nbrs.size)
    assert(r.getLong(1) == pairs.length.toLong)
    assert(r.getLong(2) == tris, "triangles")
    assert(r.getLong(3) == wedges, "wedges")
    assert(r.getDouble(4) == 3.0 * tris / wedges.toDouble ||
      r.getDouble(4) == (3L * tris).toDouble / wedges.toDouble)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("q_source_lang_entropy matches brute-force Shannon entropy of " +
    "each source's language histogram") {
    val out = Corpus.queries("q_source_lang_entropy")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.table(spark, sf, "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1)
    assert(out.keySet == bySource.keySet)
    val log2 = math.log(2.0)
    bySource.foreach { case (src, ds) =>
      val langs = ds.groupBy(_._2).map(_._2.length)
      val n = ds.length
      val h = math.log(n.toDouble) / log2 -
        langs.map(c => c * math.log(c.toDouble) / log2).sum / n
      val (on, ol, oe) = out(src)
      assert(on == n && ol == langs.size, s"$src counts")
      assert(math.abs(oe - h) < 1e-5, s"$src entropy $oe vs $h")
      assert(oe >= -1e-9, s"$src nonneg")
    }
  }

  test("q_source_effective_n equals the brute-force Kish fold and " +
      "N_eff is sandwiched by 1 and k") {
    val docs = Tables.table(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ws = docs.groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val k = ws.length.toLong
    val sw = ws.map(BigInt(_)).sum
    val sww = ws.map(w => BigInt(w) * BigInt(w)).sum
    val nEff = BigDecimal(sw * sw).toDouble / BigDecimal(sww).toDouble
    val r = Corpus.queries("q_source_effective_n")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("k") == k)
    assert(r.getAs[String]("sum_w") == sw.toString)
    assert(r.getAs[Double]("n_eff") == nEff)
    assert(r.getAs[Double]("design_effect") ==
      k.toDouble * BigDecimal(sww).toDouble /
        BigDecimal(sw * sw).toDouble)
    // Cauchy–Schwarz sandwich: 1 ≤ N_eff ≤ k (equality iff uniform)
    assert(nEff >= 1.0 - 1e-12 && nEff <= k.toDouble + 1e-12)
  }

  test("q_source_gini equals the pairwise mean-absolute-difference " +
      "replay and stays in [0, 1)") {
    val docs = Tables.table(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ws = docs.groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val k = ws.length
    val sw = ws.map(BigInt(_)).sum
    val sad = (for { a <- ws; b <- ws } yield BigInt(math.abs(a - b)))
      .sum
    val gini = BigDecimal(sad).toDouble /
      (2.0 * k.toDouble * BigDecimal(sw).toDouble)
    val r = Corpus.queries("q_source_gini")(spark, sf).collect().head
    assert(r.getAs[Long]("k") == k.toLong)
    assert(r.getAs[Double]("gini") == gini)
    assert(gini >= 0.0 && gini < 1.0)
  }
}

/** Keeps Corpus' oracle map aligned with its query map. */
class CorpusContractSpec extends AnyFunSuite {
  test("every Corpus query has an oracle") {
    assert(Corpus.oracle.keySet == Corpus.queries.keySet)
  }
}
