package graft
import org.apache.spark.sql.SparkSession

object Bench {
  // explicit ROOT locale: the default-locale f"%.3f" emits "1,234" under a
  // comma-decimal locale, producing invalid JSON (ADVICE r9)
  private def s3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def shortKey(name: String): String = name.takeWhile(_ != '_')

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    // optional local-iteration filter: comma-separated query-name substrings
    // (convenience for hand runs). Chunk CHILDREN match full names EXACTLY:
    // the parent dispatches complete names, and substring matching would
    // silently run a query in two chunks if one name ever became a prefix
    // of another (ADVICE r10 — the invariant was real but unchecked).
    val isChild = sys.env.contains("SPARK_GRAFT_CHUNK_CHILD")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(pats =>
        if (isChild) pats.contains(name) else pats.exists(name.contains)) }
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")

    // FRESH-JVM CHUNKS (r9 verdict item 2's optional half): a 300-query
    // single-JVM session accumulates old-gen pressure that min-of-reps
    // samples but cannot reject — r9 recorded q139 at 16.4 s in-suite
    // (one 78 s rep) vs 8.5 s solo, same code. Chunking bounds the churn
    // any query can inherit to <= chunkEvery predecessors: the parent
    // spawns one child JVM per chunk (same module opens/heap via the
    // parent's own JVM args, same classpath) and merges the chunk files.
    // Any spawn failure falls back to the classic single-JVM path.
    val chunkEvery = sys.env.getOrElse("SPARK_GRAFT_FORK_EVERY", "120").toInt
    if (!isChild && chunkEvery > 0 && selected.size > chunkEvery) {
      runChunked(selected.map(_._1), chunkEvery, sfDir, reps, outFile) match {
        case Some((resultsMs, detailRows, n)) =>
          emit(resultsMs, detailRows, n, reps, sfDir, outFile)
          return
        case None =>
          System.err.println("[bench] chunk spawn failed; falling back to in-process")
      }
    }
    val (results, detail) = runInProcess(selected, sfDir, reps)
    val resultsMs = results.map { case (k, v) => shortKey(k) -> Math.round(v * 1000) }
    val detailRows = detail.map { case (name, rs) =>
      val repsJson = rs.map { case (t, la, gc) =>
        s"""{"sec":${s3(t)},"load":${s3(la)},"gc_ms":$gc}""" }.mkString("[", ",", "]")
      s"""  "${shortKey(name)}": $repsJson"""
    }.toSeq
    emit(resultsMs, detailRows, results.size, reps, sfDir, outFile)
  }

  /** Spawn one child JVM per chunk of query names; each child runs the
    * classic in-process path over exactly its names and writes its own
    * out/detail files, which the parent splices. Returns None if any
    * child cannot be started or leaves no output (→ caller falls back). */
  private def runChunked(names: Seq[String], chunkEvery: Int, sfDir: String,
      reps: Int, outFile: String): Option[(Map[String, Long], Seq[String], Int)] = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    val nChunks = (names.size + chunkEvery - 1) / chunkEvery
    val chunks = names.grouped((names.size + nChunks - 1) / nChunks).toSeq
    val resultsMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val detailRows = scala.collection.mutable.ArrayBuffer.empty[String]
    // no non-local returns here: a `return` inside the loop body would
    // desugar to NonLocalReturnControl and be swallowed by our own catch
    def runOne(chunk: Seq[String], i: Int): Boolean =
      try {
        val childOut = java.nio.file.Files
          .createTempFile(s"graft_bench_chunk$i", ".json").toString
        val log = java.io.File.createTempFile(s"graft_bench_chunk$i", ".log")
        val pb = new ProcessBuilder(
          (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava)
        // child stdout/stderr go to a log file, NOT this process's stdout:
        // the driver's tail capture must only ever see the PARENT's merged
        // final line, never a chunk's
        pb.redirectOutput(log)
        pb.redirectErrorStream(true)
        val env = pb.environment()
        // the value is the chunk index: children key their calibration
        // anchor rows by it so the merged detail file keeps one anchor
        // per chunk JVM (isChild only tests presence)
        env.put("SPARK_GRAFT_CHUNK_CHILD", i.toString)
        env.put("SPARK_GRAFT_ONLY", chunk.mkString(","))
        env.put("SPARK_GRAFT_BENCH_OUT", childOut)
        val rc = pb.start().waitFor()
        val line = java.nio.file.Files.readString(java.nio.file.Paths.get(childOut))
        if (rc != 0 || line.isEmpty) {
          System.err.println(s"[bench] chunk $i rc=$rc out=${line.length}B " +
            s"log=${log.getAbsolutePath}")
          false
        } else {
          // child line: {"metric":...,"queries":{"q01":526,...},...} — keys
          // and integer values only inside the braces (we wrote it)
          """"queries":\{([^}]*)\}""".r.findFirstMatchIn(line).map(_.group(1)) match {
            case None => false
            case Some(qs) =>
              qs.split(',').filter(_.nonEmpty).foreach { kv =>
                val Array(k, v) = kv.split(':')
                resultsMs.put(k.stripPrefix("\"").stripSuffix("\""), v.toLong): Unit
              }
              // child detail: rows sit between the "queries":{ line and the }}
              val det = java.nio.file.Files.readString(
                java.nio.file.Paths.get(childOut.stripSuffix(".json") + "_detail.json"))
              val start = det.indexOf("\"queries\":{\n")
              val end = det.lastIndexOf("\n}}")
              if (start < 0 || end <= start) false
              else {
                detailRows += det.substring(start + "\"queries\":{\n".length, end)
                true
              }
          }
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] chunk $i failed: ${e.getMessage}")
          false
      }
    val allOk = chunks.zipWithIndex.forall { case (c, i) => runOne(c, i) }
    if (allOk) Some((resultsMs.toMap, detailRows.toSeq, resultsMs.size)) else None
  }

  private def runInProcess(selected: Seq[(String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame)], sfDir: String, reps: Int)
      : (Map[String, Double], scala.collection.mutable.LinkedHashMap[String,
          scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]]) = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/IO paths — including the noop writer and decimal
    // aggregation, which the measured queries all use — so the first
    // measured query isn't paying session start-up costs. Resilient: a
    // broken environment should still reach the per-query loop, whose
    // failures are reported individually.
    spark.range(1000000L).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("sum(cast(l_quantity as decimal(18,2))) as s")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup read failed: ${e.getMessage}")
    }
    // min-of-REPS per query: this VM shows multi-second ambient-load spikes
    // that land on random queries (measured: the same query 1.2 s and
    // 12.5 s across back-to-back runs); the min is the reproducible cost.
    // INTERLEAVED passes (round-8 lesson): reps used to run back-to-back
    // per query, so one multi-second ambient-load window landed on BOTH
    // reps of the same query and min() couldn't reject it — the r8 driver
    // window manufactured 19 phantom regressions that way (the contiguous
    // q205–q219 block, every one re-measured clean). Now the FULL query
    // list runs once per pass, then again: the same query's reps are
    // separated by an entire pass (~minutes), so the min decorrelates
    // from any one load spike. /proc/loadavg is snapshotted per rep into
    // the detail file as an adjudication aid.
    def loadavg(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(' ').head.toDouble
      catch { case _: Throwable => -1.0 }
    // Cumulative JVM GC time: loadavg adjudicates AMBIENT contention but is
    // blind to single-JVM heap pressure (r9: q139 recorded one 78 s rep at
    // loadavg 1.85 — old-gen churn from 300 earlier queries, not load). The
    // per-rep GC delta separates the two failure modes from artifacts alone.
    def gcMillis(): Long =
      try {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
      } catch { case _: Throwable => -1L }
    val detail = scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]]
    // WINDOW CALIBRATION anchor (r14 verdict item 3): identical code
    // measured 651 s and 937 s across two ambient windows, and PERF
    // charged the delta to the round's diff. One fixed, SF-independent,
    // constant-work job per rep pass gives every window a normalizer the
    // adjudicator can divide by. Detail-file ONLY (key "zz…", skipped in
    // the results map): the final-line `queries`/total contract is
    // untouched. The chunk index keys each child's anchor separately.
    val calibKey =
      s"zz${sys.env.getOrElse("SPARK_GRAFT_CHUNK_CHILD", "")}_calib"
    def runCalib(): Unit = {
      val la = loadavg()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      try spark.range(100000000L)
        .selectExpr("sum(id * (id % 1000 + 7)) as s")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] calib FAILED: ${e.getMessage}")
      }
      detail.getOrElseUpdate(calibKey,
        scala.collection.mutable.ArrayBuffer.empty) +=
        (((System.nanoTime() - t0) / 1e9, la, gcMillis() - g0))
    }
    for (_ <- 0 until reps) {
    runCalib()
    for ((name, fn) <- selected) {
      // reps stay independent/cold: operators that cache internally
      // (e.g. the LSH shingle sets) must not hand rep 2 a warm cache;
      // releaseAll also clears the pinned-frame registry
      graft.ext.PinnedCache.releaseAll()
      spark.catalog.clearCache()
      val la = loadavg()
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      // Write to the noop sink so the MEASURED plan is the VERIFIED plan:
      // under a bare count() Catalyst prunes projections and drops
      // top-level sorts (TakeOrderedAndProject, window projections),
      // understating cost.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        // a failed query must be VISIBLE in driver logs, not a silent ~0s
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val t = (System.nanoTime() - t0) / 1e9
      val gc = gcMillis() - g0
      detail.getOrElseUpdate(name,
        scala.collection.mutable.ArrayBuffer.empty) += ((t, la, gc))
    }
    }
    spark.stop()
    // the calibration anchor stays OUT of the results map (and therefore
    // out of the final line's total/queries) — detail-file evidence only
    (detail.collect { case (name, ts) if name != calibKey =>
      name -> ts.map(_._1).min }.toMap, detail)
  }

  /** Write the out/detail files and print the self-limiting final line —
    * shared by the merged-chunks path and the classic in-process path.
    * `resultsMs` is keyed by the `qNN` short id; `detailRows` are
    * pre-rendered `"qNN": [...]` JSON rows. */
  private def emit(resultsMs: Map[String, Long], detailRows: Seq[String],
      n: Int, reps: Int, sfDir: String, outFile: String): Unit = {
    // ONE compact line that MUST fit the driver's ~2000-char tail capture.
    // Four rounds of BENCH_r0N.json ended "parsed": null; by r6 the cause
    // was pure size (252 queries x ~12 bytes ≈ 3 KB front-truncated the
    // line). The final line is now SELF-LIMITING: summary fields plus the
    // slowest-K per-query entries (millisecond integers keyed by the `qNN`
    // short id), where K is chosen so the whole line stays under a hard
    // byte budget. The COMPLETE per-query dict goes to BENCH_local.json
    // (committed every round) — `file` points there and `n` records how
    // many queries the total covers.
    val total = resultsMs.values.sum / 1000.0
    val entries = resultsMs.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
    val fullQs = entries.mkString("{", ",", "}")
    def mkLine(qs: String): String =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","n":$n,"qunit":"ms","queries":$qs,"file":"$outFile","sf":"$sfDir"}"""
    val fullLine = mkLine(fullQs)
    // tail line: slowest-first entries until the byte budget is hit; sbt's
    // own trailing "[success] Total time..." line costs ~90 chars of window.
    val budget = sys.env.getOrElse("SPARK_GRAFT_LINE_BUDGET", "1700").toInt
    val bySlow = resultsMs.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + v }
    val fixedLen = mkLine("{}").length
    val keep = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = fixedLen
    bySlow.foreach { e =>
      val add = e.length + (if (keep.isEmpty) 0 else 1)
      if (used + add <= budget) { keep += e; used += add }
    }
    val line =
      if (fullLine.length <= budget) fullLine
      else mkLine(keep.mkString("{", ",", "}"))
    // three redundancy layers for the driver's tail capture, whose r4/r5
    // parses came back null even with the line present:
    // (1) persist the JSON to a file (durable regardless of capture),
    // (2) print it now, (3) re-print it from a shutdown hook so the LAST
    // lines this JVM emits are the bare JSON and the file path — after
    // sbt's log wrapper has nothing left to interleave. run/outputStrategy
    // in build.sbt is StdoutOutput so none of these carry an sbt prefix.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // Per-rep adjudication detail: every pass's (seconds, loadavg-at-start,
    // GC-time delta) per query, so a suspicious BENCH value can be
    // attributed to ambient load OR single-JVM heap pressure without a
    // re-measure session (the r8 judge had to re-bench 8 queries by hand;
    // the r9 judge re-benched 6 to separate the two). Self-evidencing
    // metadata per ADVICE r8: timestamp. gc_ms resets per chunk JVM, so
    // under chunking it also bounds how much churn a rep can inherit.
    try {
      val ts = java.time.Instant.now().toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outFile.stripSuffix(".json") + "_detail.json"),
        s"""{"ts":"$ts","sf":"$sfDir","reps":$reps,"interleaved":true,\n"queries":{\n${detailRows.mkString(",\n")}\n}}\n""")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write detail: ${e.getMessage}")
    }
    println(line)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      System.out.println(line)
      System.out.flush()
    }))
  }
}
