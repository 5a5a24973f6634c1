package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The MM solve's mathematical contract on constructed duel matrices. */
class BradleyTerrySpec extends AnyFunSuite {

  private val abc = Seq("a", "b", "c")

  test("transitive dominance recovers the order; strengths normalize to 1") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1
    val games = Map(("a", "b") -> 10L, ("b", "c") -> 10L, ("a", "c") -> 10L)
    val wins = Map("a" -> 18L, "b" -> 10L, "c" -> 2L)
    val p = BradleyTerry.solve(abc, games, wins)
    assert(p("a") > p("b") && p("b") > p("c"))
    assert(math.abs(abc.map(p).sum - 1.0) < 1e-12)
    assert(p.values.forall(v => v > 0.0 && v < 1.0))
  }

  test("symmetric duels give equal strengths") {
    val games = Map(("a", "b") -> 10L, ("b", "c") -> 10L, ("a", "c") -> 10L)
    val wins = Map("a" -> 10L, "b" -> 10L, "c" -> 10L)
    val p = BradleyTerry.solve(abc, games, wins)
    assert(p("a") == p("b") && p("b") == p("c"))
  }

  test("doubling every count is a no-op (scale invariance of the MM path)") {
    val games = Map(("a", "b") -> 7L, ("b", "c") -> 5L, ("a", "c") -> 9L)
    val wins = Map("a" -> 11L, "b" -> 6L, "c" -> 4L)
    val p1 = BradleyTerry.solve(abc, games, wins)
    val p2 = BradleyTerry.solve(abc,
      games.map { case (k, v) => k -> v * 2 },
      wins.map { case (k, v) => k -> v * 2 })
    // bit-identical, not approximately: each MM step scales W and N
    // together, so every intermediate double is the same
    assert(abc.forall(i => p1(i) == p2(i)))
  }

  test("an item with zero games keeps strength 0; zero iterations = uniform") {
    val games = Map(("a", "b") -> 10L)
    val wins = Map("a" -> 7L, "b" -> 3L)
    val p = BradleyTerry.solve(abc, games, wins)
    assert(p("c") == 0.0)
    assert(p("a") > p("b"))
    val u = BradleyTerry.solve(abc, games, wins, iters = 0)
    assert(abc.forall(i => u(i) == 1.0))
  }

  test("unordered pair keys: (i,j) and (j,i) lookups are interchangeable") {
    val p1 = BradleyTerry.solve(Seq("a", "b"),
      Map(("a", "b") -> 10L), Map("a" -> 6L, "b" -> 4L))
    val p2 = BradleyTerry.solve(Seq("a", "b"),
      Map(("b", "a") -> 10L), Map("a" -> 6L, "b" -> 4L))
    assert(p1 == p2)
  }
}
