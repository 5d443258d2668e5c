package graft.operators

/** Scratch probe (deleted before commit): per-query localCheckpoint
  * storage footprints — run each checkpoint-carrying query, then read
  * the block manager's per-RDD storage info before clearing. Evidence
  * for the r21 verdict item 7 (corpus-token-scale checkpoints:
  * keep / drop / StorageLevel decision). */
object XCkptFootprint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "doc_commonness", "tfidf_top_terms", "dedup_ngram_jaccard",
      "jaccard_df_ledger", "bm25_scores", "hybrid_search_rrf",
      "dedup_cc_components", "sequence_pack_plan_bpe", "token_budget_head")
    val spark = graft.ToolSession.local("32", logLevel = "ERROR")
    // corpus scale context
    val docsBytes = new java.io.File(s"$sfDir/documents.parquet")
    println(s"sf=$sfDir documents.parquet bytes=" +
      (if (docsBytes.isFile) docsBytes.length
       else Option(docsBytes.listFiles).map(_.map(_.length).sum).getOrElse(-1L)))
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val infos = spark.sparkContext.getRDDStorageInfo
      val total = infos.map(i => i.memSize + i.diskSize).sum
      println(f"$name%-24s checkpointedRDDs=${infos.length}%2d " +
        f"mem=${infos.map(_.memSize).sum / 1048576.0}%9.1fMB " +
        f"disk=${infos.map(_.diskSize).sum / 1048576.0}%8.1fMB " +
        f"total=${total / 1048576.0}%9.1fMB")
      infos.sortBy(-_.memSize).take(4).foreach { i =>
        println(f"    rdd=${i.id}%5d parts=${i.numCachedPartitions}%3d " +
          f"mem=${i.memSize / 1048576.0}%9.1fMB disk=${i.diskSize / 1048576.0}%8.1fMB  ${i.name}")
      }
      graft.ToolSession.clearStorage(spark)
    }
    spark.stop()
  }
}
