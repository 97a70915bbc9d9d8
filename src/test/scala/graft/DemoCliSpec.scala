package graft

import java.nio.file.Files

import graft.graph.DemoMain

/** Golden tests for the demo CLI — command-for-command parity with the
  * reference's app (reference: app/Main.hs:161-205). The expected outputs
  * derive from the bigBang fixture: Bob's hobbies need {cards, chips,
  * poles, map}; Bob owns the map; friends Jane and Jose own the cards and
  * poles ⇒ Bob is missing exactly "Poker Chips" (app/Main.hs:102-114).
  */
class DemoCliSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("graft-demo-cli").toString

  private def cli(dir: String, args: String*): Seq[String] =
    DemoMain.run(spark, dir, args)

  test("create then query Bob reports the missing Poker Chips") {
    val dir = freshDir()
    assert(cli(dir, "create") === Seq("created"))
    assert(cli(dir, "query", "Bob") === Seq("Poker Chips"))
  }

  test("buy closes the gap; discard reopens it (app/Main.hs:175-182)") {
    val dir = freshDir()
    cli(dir, "create")
    assert(cli(dir, "buy", "Bob", "Poker Chips") === Seq("ok"))
    assert(cli(dir, "query", "Bob").isEmpty)
    assert(cli(dir, "discard", "Bob", "Poker Chips") === Seq("ok"))
    assert(cli(dir, "query", "Bob") === Seq("Poker Chips"))
  }

  test("unfriend removes Jane's cards from Bob's available pool") {
    val dir = freshDir()
    cli(dir, "create")
    assert(cli(dir, "unfriend", "Bob", "Jane") === Seq("ok"))
    // without Jane, Bob loses access to the Deck of Cards too
    assert(cli(dir, "query", "Bob") === Seq("Deck of Cards", "Poker Chips"))
    assert(cli(dir, "friend", "Bob", "Jane") === Seq("ok"))
    assert(cli(dir, "query", "Bob") === Seq("Poker Chips"))
  }

  test("marry and divorce maintain the symmetric spouse relation") {
    val dir = freshDir()
    cli(dir, "create")
    assert(cli(dir, "divorce", "Bob", "Jane") === Seq("ok"))
    val afterDivorce = graft.graph.PropertyGraph.load(spark, graft.graph.DemoGraph.schema, dir)
    assert(afterDivorce.edges("spouse").count() === 0L)
    assert(cli(dir, "marry", "Jose", "Jane") === Seq("ok"))
    val afterMarry = graft.graph.PropertyGraph.load(spark, graft.graph.DemoGraph.schema, dir)
    // symmetric: visible from both endpoints
    assert(afterMarry.isRelated("spouse", "person:jose", "person:jane"))
    assert(afterMarry.isRelated("spouse", "person:jane", "person:jose"))
  }

  test("unknown command prints usage") {
    val out = cli(freshDir(), "frobnicate")
    assert(out.size === 1 && out.head.startsWith("usage:"))
  }
}
