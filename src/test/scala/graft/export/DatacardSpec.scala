package graft.export

import org.scalatest.funsuite.AnyFunSuite

class DatacardSpec extends AnyFunSuite {

  private val spec = Datacard.Spec(
    categories = Seq("sr", "cr"),
    signals = Seq("sig"),
    backgrounds = Seq("bkg1", "bkg2"),
    observations = Map("sr" -> 125.0, "cr" -> 3000.0),
    rates = Map(
      ("sr", "sig") -> 10.5, ("sr", "bkg1") -> 100.0, ("sr", "bkg2") -> 20.0,
      ("cr", "sig") -> 0.1, ("cr", "bkg1") -> 2900.0), // (cr,bkg2) missing
    systematics = Seq(
      ("lumi", "lnN", Map(
        ("sr", "sig") -> 1.02, ("sr", "bkg1") -> 1.02,
        ("cr", "sig") -> 1.02, ("cr", "bkg1") -> 1.02))))

  test("header counts and shape") {
    val card = Datacard.render(spec)
    assert(card.contains("imax 2"))
    assert(card.contains("jmax 2")) // 3 processes - 1
    assert(card.contains("kmax 1"))
    val lines = card.split("\n")
    assert(lines.count(_.startsWith("bin")) == 2)
    assert(lines.count(_.startsWith("process")) == 2)
  }

  test("combine id convention: signals <= 0, backgrounds >= 1") {
    val idLine = Datacard.render(spec).split("\n")
      .filter(_.startsWith("process"))(1)
    assert(idLine.split("\\s+").drop(1).toSeq == Seq("0", "1", "2", "0", "1", "2"))
  }

  test("missing rates get the empty-bin epsilon; systematics render dashes") {
    val card = Datacard.render(spec)
    assert(card.contains("1.0E-5")) // (cr, bkg2) empty-bin fill
    val lumi = card.split("\n").find(_.startsWith("lumi")).get
    assert(lumi.split("\\s+").count(_ == "-") == 2) // both bkg2 columns
    assert(lumi.split("\\s+").count(_ == "1.02") == 4)
  }

  test("observations are rendered per category in order") {
    val obs = Datacard.render(spec).split("\n").find(_.startsWith("observation")).get
    assert(obs.split("\\s+").drop(1).toSeq == Seq("125", "3000"))
  }
}
