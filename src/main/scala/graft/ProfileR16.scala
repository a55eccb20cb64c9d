package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc phase-level wall-clock profiling for the round-16
  * optimization pass (not part of the driver contract; Bench is the
  * official probe). Times the expensive queries' internal phases so
  * optimization targets the measured cost, not the guessed one.
  * Usage: `sbt "runMain graft.ProfileR16 [sfDir] [section ...]"`. */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.drop(1).toSet
    def want(s: String): Boolean = sections.isEmpty || sections(s)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    import graft.pipeline.{Graph, Similarity}
    import graft.queries.QueryDsl.t

    if (want("graph")) {
      val li = t(spark, dir, "lineitem")
      // warm the scan
      force(li.select(col("l_orderkey"), col("l_suppkey")))
      val co = Graph.supplierCooccurrence(li)
      time("cooccurrence-build")(force(co))
      time("cooccurrence-build-warm")(force(co))
      val edges = co.localCheckpoint()
      println(s"PROFILE edges=${edges.count()} verts=" +
        edges.select(col("src")).distinct().count())
      time("pagerank-10it-total")(force(Graph.pagerank(co, iters = 10)))
      time("pagerank-10it-warm")(force(Graph.pagerank(co, iters = 10)))
      time("pagerank-prepart")(force(
        Graph.pagerank(co, iters = 10, prePartitionEdges = true)))
      time("trustrank-10it")(force(Graph.personalizedPagerank(
        co, isSeed = v => pmod(v, lit(10)) === 0, iters = 10)))
      val strong = co.filter(col("w") >= 8)
      time("neighborhood-r3")(force(
        Graph.neighborhoodFunction(strong, radius = 3, k = 32)))
      time("harmonic-r3")(force(Graph.harmonicCentrality(strong, radius = 3)))
      time("lpa-5it")(force(Graph.labelPropagation(strong, iters = 5)))
    }

    if (sections.exists(_.startsWith("q")) || sections.exists(_.startsWith("img"))) {
      // mini-bench: warm-up + 2 timed passes, min per query — the
      // Bench methodology on a subset, for optimization iteration
      val subset = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => sections(n) }
      subset.foreach { case (_, fn) =>
        try force(fn(spark, dir)) catch { case _: Throwable => () } }
      def pass(): Map[String, Double] = subset.map { case (n, fn) =>
        val t0 = System.nanoTime()
        try force(fn(spark, dir)) catch { case _: Throwable => () }
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
      val p1 = pass(); val p2 = pass()
      subset.foreach { case (n, _) =>
        println(f"PROFILE bench $n: ${math.min(p1(n), p2(n))}%.3f s") }
    }

    if (want("prx")) {
      // pagerank variants: parts x broadcast-rank, on the real q119
      // graph — replicates Graph.pagerank's fast path with knobs
      val li = t(spark, dir, "lineitem")
      val co = Graph.supplierCooccurrence(li)
      def pagerankX(parts: Int, bcastRank: Boolean, label: String): Unit = {
        val e0 = co.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        val outw = e0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        val ew0 = e0.join(outw, Seq("src"))
          .select(col("src"), col("dst"), col("w"), col("ow")).localCheckpoint()
        val n = ew0.select(col("src")).distinct().count()
        val ew = ew0.coalesce(parts)
        val base = (3L * Graph.Scale) / (20L * n)
        var rank = ew.select(col("src").as("v")).distinct()
          .select(col("v"), lit(Graph.Scale / n).as("rank"))
        time(label) {
          for (k <- 1 to 10) {
            val r = if (bcastRank) broadcast(rank) else rank
            val contrib = ew
              .join(r.select(col("v").as("src"), col("rank")), Seq("src"))
              .select(col("dst").as("v"), expr("(rank * w) div ow").as("c"))
              .groupBy(col("v")).agg(sum(col("c")).as("sc"))
            val stepped = contrib.select(col("v"),
              (lit(base) + expr("(17 * sc) div 20")).as("rank"))
            rank = if (k % 5 == 0 || k == 10) stepped.localCheckpoint() else stepped
          }
          force(rank)
        }
      }
      pagerankX(1, bcastRank = false, "prx-p1-smj")
      pagerankX(1, bcastRank = false, "prx-p1-smj-warm")
      pagerankX(4, bcastRank = false, "prx-p4-smj")
      pagerankX(8, bcastRank = false, "prx-p8-smj")
      pagerankX(1, bcastRank = true, "prx-p1-bc")
      pagerankX(8, bcastRank = true, "prx-p8-bc")
      pagerankX(32, bcastRank = true, "prx-p32-bc")
      pagerankX(8, bcastRank = true, "prx-p8-bc-warm")
    }

    if (want("prx2")) {
      // loop fixed-cost dissection: AQE on/off x checkpoint cadence
      val li = t(spark, dir, "lineitem")
      val co = Graph.supplierCooccurrence(li)
      def loopX(cadence: Int, aqe: Boolean, label: String): Unit = {
        val e0 = co.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        val outw = e0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
        val ew = e0.join(outw, Seq("src"))
          .select(col("src"), col("dst"), col("w"), col("ow"))
          .localCheckpoint().coalesce(1)
        val n = ew.select(col("src")).distinct().count()
        val base = (3L * Graph.Scale) / (20L * n)
        var rank = ew.select(col("src").as("v")).distinct()
          .select(col("v"), lit(Graph.Scale / n).as("rank")).localCheckpoint()
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        time(label) {
          for (k <- 1 to 10) {
            val contrib = ew
              .join(rank.select(col("v").as("src"), col("rank")), Seq("src"))
              .select(col("dst").as("v"), expr("(rank * w) div ow").as("c"))
              .groupBy(col("v")).agg(sum(col("c")).as("sc"))
            val stepped = contrib.select(col("v"),
              (lit(base) + expr("(17 * sc) div 20")).as("rank"))
            rank = if (k % cadence == 0 || k == 10) stepped.localCheckpoint() else stepped
          }
          force(rank)
        }
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
      loopX(5, aqe = true, "prx2-c5-aqe")
      loopX(5, aqe = true, "prx2-c5-aqe-warm")
      loopX(5, aqe = false, "prx2-c5-noaqe")
      loopX(5, aqe = false, "prx2-c5-noaqe-warm")
      loopX(10, aqe = false, "prx2-c10-noaqe")
      loopX(2, aqe = false, "prx2-c2-noaqe")
      loopX(1, aqe = false, "prx2-c1-noaqe")
      loopX(5, aqe = true, "prx2-c5-aqe-again")
    }

    if (want("prx3")) {
      // co-occurrence build dissection (the shared cost of all 11
      // graph queries): scan / group / expand / count sub-steps, each
      // measured twice (JIT)
      val li = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      for (round <- 1 to 2) {
        time(s"prx3-scan-$round")(force(li))
        val grouped = li.groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_suppkey")).as("ss"))
        time(s"prx3-group-$round")(force(grouped))
        val pairs = grouped.select(explode(expr(
          "flatten(transform(ss, x -> transform(filter(ss, y -> y != x), " +
            "y -> named_struct('src', x, 'dst', y))))")).as("p"))
          .select(col("p.src").as("src"), col("p.dst").as("dst"))
        time(s"prx3-expand-$round")(force(pairs))
        time(s"prx3-full-$round")(force(
          pairs.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))))
        // variant: sort_array once, ordered-pair expansion via index
        // loops (same result set)
        val grouped2 = li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
        val pairs2 = grouped2.select(explode(expr(
          "flatten(transform(ss, x -> transform(filter(ss, y -> y != x), " +
            "y -> struct(x AS src, y AS dst))))")).as("p"))
          .select(col("p.src").as("src"), col("p.dst").as("dst"))
        time(s"prx3-variant2-full-$round")(force(
          pairs2.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))))
        // variant3: pack the pair into ONE long key for the count
        // shuffle (narrower exchange + single-word grouping key)
        val packed = grouped.select(explode(expr(
          "flatten(transform(ss, x -> transform(filter(ss, y -> y != x), " +
            "y -> x * 4294967296L + y)))")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("w"))
          .select(shiftrightunsigned(col("k"), 32).as("src"),
            col("k").bitwiseAND(lit(4294967295L)).as("dst"), col("w"))
        time(s"prx3-variant3-full-$round")(force(packed))
      }
    }

    if (want("ivf")) {
      val emb = t(spark, dir, "embeddings")
      force(emb)
      val centers = time("ivf-fit")(Similarity.ivfFitCenters(emb))
      val ixDir = s"${System.getProperty("java.io.tmpdir")}/graft_prof_ivf"
      time("ivf-encode-write-partitioned")(
        Similarity.ivfEncode(emb, centers)
          .write.partitionBy("cluster").mode("overwrite").parquet(ixDir))
      time("ivf-read-serve")(force(Similarity.ivfServe(
        spark.read.parquet(ixDir), centers,
        emb.filter(col("vec_id") < 20), k = 5)))
      val n = java.nio.file.Files.walk(java.nio.file.Paths.get(ixDir))
        .filter(p => p.toString.endsWith(".parquet")).count()
      println(s"PROFILE ivf store files=$n")
      time("ivf-encode-write-clustered")(
        Similarity.ivfEncode(emb, centers).repartition(col("cluster"))
          .write.partitionBy("cluster").mode("overwrite").parquet(ixDir))
      time("ivf-read-serve-clustered")(force(Similarity.ivfServe(
        spark.read.parquet(ixDir), centers,
        emb.filter(col("vec_id") < 20), k = 5)))
      val n2 = java.nio.file.Files.walk(java.nio.file.Paths.get(ixDir))
        .filter(p => p.toString.endsWith(".parquet")).count()
      println(s"PROFILE ivf clustered store files=$n2")
    }

    if (want("dedup")) {
      // dedup-family dissection (q31/q32/q153's shared phases): where
      // do the ~3s of the exact side and ~1s of the LSH side go?
      import graft.pipeline.{Dedup, PartitionUtil}
      val docs = t(spark, dir, "documents")
      force(docs.select(col("doc_id"), col("text")))
      for (round <- 1 to 2) {
        val sh = PartitionUtil.spread(docs)
          .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        time(s"dedup-shingles-$round")(force(sh))
        val posting = sh
          .withColumn("sz", size(col("sh")).cast("long"))
          .select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
        time(s"dedup-posting-$round")(force(posting))
        val dfreq = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
        time(s"dedup-dfreq-$round")(force(dfreq))
        val prefix = posting.join(dfreq, Seq("s"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .filter(col("rn") <= expr("sz - (sz * 8000 + 9999) DIV 10000 + 1"))
          .select(xxhash64(col("s")).as("h"), col("doc_id"), col("sz"))
        time(s"dedup-prefix-$round")(force(prefix))
        time(s"dedup-q31-full-$round")(force(
          Dedup.ngramJaccardPairs(docs, 3, 0.8)))
        time(s"dedup-lsh-full-$round")(force(
          Dedup.minhashLshPairs(docs, 3, 64, 16)))
      }
    }

    if (want("dedup2")) {
      // q31 candidate-stage variants: the before-plan shows the whole
      // posting->dfreq->window prefix pipeline computed TWICE (one
      // copy per side of the candidate self-join; the broadcast side
      // can't reuse the probe side's exchange). Variants that compute
      // it once, measured on the real corpus.
      import graft.pipeline.{Dedup, PartitionUtil}
      import org.apache.spark.storage.StorageLevel
      val docs = t(spark, dir, "documents")
      force(docs.select(col("doc_id"), col("text")))
      val den = 10000L; val num = 8000L
      def mkPrefix(sh: DataFrame): DataFrame = {
        val posting = sh.select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
        val dfreq = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
        posting.join(dfreq, Seq("s"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .filter(col("rn") <= expr(s"sz - (sz * $num + ${den - 1}) DIV $den + 1"))
          .select(xxhash64(col("s")).as("h"), col("doc_id"), col("sz"))
      }
      def rescore(cand: DataFrame, sh: DataFrame): DataFrame =
        cand
          .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
          .filter(col("jaccard") >= 0.8)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      def sizeFilt(c: DataFrame): DataFrame =
        c.filter(least(col("sz_a"), col("sz_b")) * den >=
          greatest(col("sz_a"), col("sz_b")) * num)
          .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b")).distinct()
      for (round <- 1 to 2) {
        val sh = PartitionUtil.spread(docs)
          .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
          .withColumn("sz", size(col("sh")).cast("long"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // (a) current: plain self-join (BHJ picks one side to broadcast)
        val prefix = mkPrefix(sh)
        val candA = sizeFilt(
          prefix.select(col("h"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
            .join(prefix.select(col("h"), col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
            .filter(col("id_a") < col("id_b")))
        time(s"dedup2-join-current-$round")(force(rescore(candA, sh)))
        // (b) SMJ-hinted self-join: identical shuffle exchanges on h
        // should collapse via ReuseExchange -> prefix computed once
        val pa = prefix.select(col("h"), col("doc_id").as("id_a"), col("sz").as("sz_a")).hint("merge")
        val pb = prefix.select(col("h"), col("doc_id").as("id_b"), col("sz").as("sz_b"))
        val candB = sizeFilt(pa.join(pb, Seq("h")).filter(col("id_a") < col("id_b")))
        time(s"dedup2-join-smj-$round")(force(rescore(candB, sh)))
        // (c) bucket expand: groupBy(h) + ordered-pair expansion
        val candC = sizeFilt(prefix.groupBy(col("h"))
          .agg(collect_list(struct(col("doc_id").as("d"), col("sz").as("z"))).as("ds"))
          .select(explode(expr(
            "filter(flatten(transform(ds, a -> transform(ds, " +
              "b -> struct(a.d AS id_a, a.z AS sz_a, b.d AS id_b, b.z AS sz_b)))), " +
              "p -> p.id_a < p.id_b)")).as("p"))
          .select(col("p.id_a").as("id_a"), col("p.sz_a").as("sz_a"),
            col("p.id_b").as("id_b"), col("p.sz_b").as("sz_b")))
        time(s"dedup2-bucket-expand-$round")(force(rescore(candC, sh)))
        // (d) eager localCheckpoint of prefix
        val pchk = mkPrefix(sh).localCheckpoint()
        val candD = sizeFilt(
          pchk.select(col("h"), col("doc_id").as("id_a"), col("sz").as("sz_a"))
            .join(pchk.select(col("h"), col("doc_id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
            .filter(col("id_a") < col("id_b")))
        time(s"dedup2-checkpoint-$round")(force(rescore(candD, sh)))
        sh.unpersist(true)
      }
    }

    if (want("semdedup")) {
      // q97: the (fit + cross-join score + normalize) assignment
      // subtree feeds THREE consumers (pair sides a/b + the final
      // left join) and recomputes per consumer (3 BNLJ in the before
      // plan). Variant: one eager localCheckpoint of the assignment.
      import graft.pipeline.{Dedup, Similarity}
      val emb = t(spark, dir, "embeddings")
      force(emb)
      val tq = 3000L
      def semDedupChk(): DataFrame = {
        val av = Similarity.gridCentroidAssignment(emb)
          .select(col("vec_id"), col("cluster"),
            Similarity.normalizeUdf(col("v")).as("nv"))
          .localCheckpoint()
        val a = av.select(col("cluster"), col("vec_id").as("id_a"), col("nv").as("va"))
        val b = av.select(col("cluster"), col("vec_id").as("id_b"), col("nv").as("vb"))
        val dropped = a.join(b, Seq("cluster"))
          .filter(col("id_b") < col("id_a"))
          .filter(floor(Similarity.nativeDot(spark)(col("va"), col("vb"))
            * lit(10000.0)).cast("long") >= lit(tq))
          .select(col("id_a").as("vec_id")).distinct()
          .withColumn("is_dup", lit(1L))
        av.join(dropped, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cluster"),
            when(col("is_dup").isNull, 1L).otherwise(0L).as("keep"))
          .orderBy(col("vec_id"))
      }
      for (round <- 1 to 2) {
        time(s"semdedup-current-$round")(force(Dedup.semDedup(emb, 0.3, 64)))
        time(s"semdedup-checkpointed-$round")(force(semDedupChk()))
      }
    }

    if (want("neardup")) {
      // q36: bandedSignatures' (banded, nv) each feed two consumers.
      // Variant: checkpoint the shared stage once. Also times q59's
      // pair input reuse.
      import graft.pipeline.Dedup
      val emb = t(spark, dir, "embeddings")
      force(emb)
      for (round <- 1 to 2) {
        time(s"neardup-q36-current-$round")(force(
          Dedup.embeddingNearDupLsh(emb, threshold = 0.9)))
        time(s"neardup-q59-current-$round")(force(
          Dedup.dedupGroups(Dedup.embeddingNearDupLsh(emb, threshold = 0.9))))
        // checkpointed variant of q36's shape
        val (banded0, nv0) = Dedup.bandedSignatures(emb, 8, 4, 64, 42L)
        val banded = banded0.localCheckpoint(); val nv = nv0.localCheckpoint()
        val a = banded.select(col("band_idx"), col("band_hash"), col("vec_id").as("id_a"))
        val b = banded.select(col("band_idx"), col("band_hash"), col("vec_id").as("id_b"))
        val cand = a.join(b, Seq("band_idx", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        val chk = cand
          .join(nv.select(col("vec_id").as("id_a"), col("nv").as("va")), Seq("id_a"))
          .join(nv.select(col("vec_id").as("id_b"), col("nv").as("vb")), Seq("id_b"))
          .filter(graft.pipeline.Similarity.nativeDot(spark)(col("va"), col("vb")) > 0.9)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))
        time(s"neardup-q36-checkpointed-$round")(force(chk))
      }
    }

    if (want("bpe")) {
      val docs = t(spark, dir, "documents")
      force(docs.select(col("doc_id"), col("text")))
      time("bpe-train-10")(force(graft.pipeline.Bpe.bpeTrain(docs, 10)))
      time("bpe-segment-10")(force(graft.pipeline.Bpe.bpeSegment(docs, 10)))
    }

    spark.stop()
  }
}
