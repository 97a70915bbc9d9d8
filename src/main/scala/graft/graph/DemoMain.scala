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
      |  divorce <p1> <p2>""".stripMargin

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
      case _ =>
        Seq(usage)
    }
  }
}
