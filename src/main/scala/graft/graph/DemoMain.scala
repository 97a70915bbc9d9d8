package graft.graph

import org.apache.spark.sql.SparkSession

/** Runnable CLI with command-for-command parity with the reference demo app
  * (reference: app/Main.hs:161-205): `create` builds the bigBang fixture,
  * `query <name>` runs the flagship missing-tools query, and the six point
  * mutations (`buy`/`discard`/`friend`/`unfriend`/`marry`/`divorce`,
  * app/Main.hs:175-204) each do two name lookups plus one edge
  * insert/delete. The graph persists between invocations as Parquet under
  * `GRAFT_DEMO_DIR` — the durable image of the reference's
  * `filePersistence ".db"` (app/Main.hs:163-164).
  */
object DemoMain {

  private val usage: String =
    """usage: demo <command>
      |  create                 build and save the demo graph
      |  query <person>         tools <person> is missing for their hobbies
      |  buy <person> <object>  add a possession
      |  discard <person> <object>
      |  friend <p1> <p2>
      |  unfriend <p1> <p2>
      |  marry <p1> <p2>
      |  divorce <p1> <p2>
      |  ingest <dir> [rel]     stream CSV edge files (srcName,dstName)
      |                         from <dir> into relation [rel]
      |                         (default possession); unknown names are
      |                         dropped; re-runs pick up only new files""".stripMargin

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_DEMO_DIR", ".graft-demo")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dir, args.toSeq).foreach(println)
    finally spark.stop()
  }

  /** Command dispatch, returning output lines (testable without stdout
    * capture). Mutation commands follow the reference shape exactly: two
    * `lookupByName`-style scans, one edge mutation, persist
    * (app/Main.hs:175-204).
    */
  def run(spark: SparkSession, dir: String, args: Seq[String]): Seq[String] = {
    // self-describing load: the schema travels with the data (_schema
    // manifest written by save), exactly like the reference's storage;
    // directories created before the manifest existed fall back to the
    // in-code demo schema. The fallback keys on manifest EXISTENCE only —
    // a manifest that is present but corrupt, or a missing table, must
    // error loudly rather than silently run against the in-code schema.
    def load() =
      if (PropertyGraph.hasSchemaManifest(spark, dir)) PropertyGraph.load(spark, dir)
      else PropertyGraph.load(spark, DemoGraph.schema, dir)
    // Each point mutation touches exactly ONE edge table, so only that
    // relation's parquet is rewritten (saveRelation pins it first — the
    // plan reads the files being overwritten); node tables and the other
    // relations keep their files untouched.
    def mutate(rel: String)(f: PropertyGraph => PropertyGraph): Seq[String] = {
      f(load()).saveRelation(dir, rel)
      Seq("ok")
    }
    def person(g: PropertyGraph, name: String): String = g.lookupBy("Person", "name", name)
    def obj(g: PropertyGraph, name: String): String = g.lookupBy("Object", "name", name)

    args match {
      case Seq("create") =>
        DemoGraph.bigBang(spark).save(dir)
        Seq("created")
      case Seq("query", name) =>
        DemoGraph.missingTools(load(), name).collect().map(_.getString(0)).toSeq.sorted
      case Seq("buy", p, o) =>
        mutate("possession")(g => g.addRelated("possession", person(g, p), obj(g, o)))
      case Seq("discard", p, o) =>
        mutate("possession")(g => g.removeRelated("possession", person(g, p), obj(g, o)))
      case Seq("friend", p1, p2) =>
        mutate("friend")(g => g.addRelated("friend", person(g, p1), person(g, p2)))
      case Seq("unfriend", p1, p2) =>
        mutate("friend")(g => g.removeRelated("friend", person(g, p1), person(g, p2)))
      case Seq("marry", p1, p2) =>
        mutate("spouse")(g => g.addRelated("spouse", person(g, p1), person(g, p2)))
      case Seq("divorce", p1, p2) =>
        mutate("spouse")(g => g.removeRelated("spouse", person(g, p1), person(g, p2)))
      case Seq("ingest", watchDir) =>
        ingest(spark, dir, watchDir, "possession", load())
      case Seq("ingest", watchDir, rel) =>
        ingest(spark, dir, watchDir, rel, load())
      case _ =>
        Seq(usage)
    }
  }

  /** Streaming ingest verb — the online-mutation character of the
    * reference's interactive loop (app/Main.hs:173-204, one STM txn per
    * command) expressed through Structured Streaming: tail a directory of
    * CSV edge files (`srcName,dstName`) into versioned graph snapshots via
    * [[graft.streaming.Streams.GraphUpdater]], then publish the folded
    * relation into the demo dir.
    *
    * Exactly-once across re-runs and crashes:
    *   - the stream CHECKPOINT (kept under the demo dir) tracks which
    *     files were consumed — re-running against unchanged files is a
    *     no-op drain; a crashed run's re-delivered batch is absorbed by
    *     the updater's batchId guard;
    *   - the updater journals a WAL + committed snapshot versions under a
    *     transient state dir, recovered on start — a crash AFTER the
    *     stream committed a batch but BEFORE the relation was published
    *     loses nothing: the next run refolds the WAL tail; a committed
    *     snapshot taken at drain end (BEFORE publishing) prunes the WAL,
    *     so a crash anywhere in publish/cleanup recovers to exactly the
    *     published state and can never double-apply a batch;
    *   - after a successful publish the state dir is deleted (its content
    *     is fully absorbed into the demo dir), so the next run starts
    *     from the CURRENT demo state and point mutations made between
    *     ingest runs compose. Mutating the same relation concurrently
    *     WITH a running ingest is the one unsupported interleaving
    *     (single writer per relation, the standard ingestion contract).
    *
    * Name→id resolution is a stream-static join against the endpoint node
    * tables of the TARGET relation (schema-driven, so `ingest <dir>
    * friend` resolves both sides as Persons); rows naming unknown
    * endpoints are dropped, matching the inner-join semantics a bulk
    * loader would use.
    */
  private def ingest(spark: SparkSession, dir: String, watchDir: String,
      relation: String, g0: PropertyGraph): Seq[String] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import graft.schema.GraphSchema
    val ref = g0.schema.relation(relation) // unknown relation errors loudly
    // the folded edges publish under the CANONICAL stored name; accepting
    // the inverse alias here would publish under one name and read back
    // under another — demand the canonical name upfront instead
    require(!ref.reversed,
      s"ingest takes the canonical relation name '${ref.rel.name}', " +
        s"not its inverse '$relation'")
    val stateDir = s"$dir/_ingest/$relation/state"
    val updater = graft.streaming.Streams.GraphUpdater.recover(
      g0, relation, stateDir, saveEvery = 4)
    val raw = spark.readStream
      .schema(StructType(Seq(StructField("src_name", StringType),
        StructField("dst_name", StringType))))
      .csv(watchDir)
    val srcT = g0.nodeTables(ref.srcLabel)
      .select(col(GraphSchema.IdCol).as("src_id"), col("name").as("src_name"))
    val dstT = g0.nodeTables(ref.dstLabel)
      .select(col(GraphSchema.IdCol).as("dst_id"), col("name").as("dst_name"))
    val edges = raw.join(srcT, "src_name").join(dstT, "dst_name")
      .select(col("src_id"), col("dst_id"))
    val q = updater.attach(edges,
      Some(s"$dir/_ingest/$relation/checkpoint"))
    q.awaitTermination()
    // commit point BEFORE publishing: snapshot the folded state and prune
    // the covered WAL, so a crash anywhere in the publish/cleanup sequence
    // below recovers to EXACTLY this state — without it, a crash between
    // saveRelation and the state delete would leave WAL batches that the
    // next run refolds onto the already-published graph (bag semantics:
    // permanent duplicate edges)
    updater.commitSnapshot()
    updater.current().saveRelation(dir, relation)
    // count from the PUBLISHED files, not the updater's plan — the next
    // step deletes the snapshot/WAL files that plan may be rooted at
    val n = spark.read.parquet(s"$dir/edges_$relation.parquet").count()
    // state fully absorbed into the demo dir; clearing it makes the next
    // run fold onto the then-current demo state (checkpoint stays: it is
    // what makes already-consumed files a no-op). A delete failure must be
    // LOUD: leaving the snapshot silently would make the next run recover
    // from it and discard any point mutations made in between
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(statePath) && !fs.delete(statePath, true))
      throw new java.io.IOException(
        s"ingest published $relation but could not clear its state dir " +
          s"$stateDir — delete it manually before the next ingest run")
    Seq(s"ingested: $relation now has $n edges")
  }
}
