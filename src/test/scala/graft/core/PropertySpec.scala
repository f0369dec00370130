package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based coverage of the Route algebra (SURVEY §5 test plan:
  * property-based tests for Route/column algebra). Pure-JVM, no Spark;
  * runs under sbt's native ScalaCheck integration. */
object RouteProperties extends Properties("Route") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val routeGen: Gen[List[String]] = Gen.nonEmptyListOf(ident).map(_.take(4))

  property("parse/toString round-trips for field routes") =
    forAll(routeGen) { fields =>
      val s = fields.mkString(".")
      Route(s).toString == s && Route(s).fields == fields.toVector
    }

  property("parse/toString round-trips with a trailing index") =
    forAll(routeGen, Gen.chooseNum(-5, 5)) { (fields, i) =>
      val s = fields.mkString(".") + s"[$i]"
      Route(s).toString == s
    }

  property("nano format never contains dots, joins with underscores") =
    forAll(routeGen) { fields =>
      val nano = Route(fields.mkString(".")).nanoColumn
      !nano.contains(".") && nano == fields.mkString("_")
    }

  property("brace expansion size = product of alternative counts") =
    forAll(Gen.listOfN(2, Gen.nonEmptyListOf(ident).map(_.take(3)))) { groups =>
      val pattern = groups.map(_.mkString("{", ",", "}")).mkString(".")
      Route.expandBraces(pattern).size == groups.map(_.size).product
    }

  property("glob: exact names match themselves; '*' matches everything") =
    forAll(routeGen) { fields =>
      val name = fields.mkString(".")
      Route.globMatches(name, name) &&
        Route.globMatches("*", name) &&
        Route.globMatches(fields.head + ".*", name) == (fields.size > 1)
    }

  property("child/parent compose: (r / f).parent == r") =
    forAll(routeGen, ident) { (fields, f) =>
      val r = Route(fields.mkString("."))
      (r / f).parent.contains(r)
    }

  property("[:,k] slice notation is an alias for [k]") =
    forAll(routeGen, Gen.chooseNum(0, 9)) { (fields, i) =>
      Route(fields.mkString(".") + s"[:,$i]") == Route(fields.mkString(".") + s"[$i]")
    }
}
