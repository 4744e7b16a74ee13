package graft

import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.engine.{DictionaryTranslator, Preprocess}
import graft.engine.Enrich.{HeuristicColumnClassifier, HeuristicLanguageDetector}
import graft.operators.TypedAgg.{OrderRow, TopBuf, TopKOrders}

/** Property-based checks (SURVEY.md §5.3) over the pure driver-side
  * functions — totality, closed label vocabularies, aggregator bounds.
  */
object PropertySpec extends Properties("graft") {

  property("normalizeName idempotent, emits only word chars") =
    forAll { (s: String) =>
      val once = Preprocess.normalizeName(s)
      Preprocess.normalizeName(once) == once &&
        once.forall(c => c == '_' || c.isLetterOrDigit)
    }

  property("translation total, never null") = {
    val tr = new DictionaryTranslator(Map("c" -> Map("a" -> "b")))
    forAll { (vs: List[String]) =>
      val out = tr.translate(vs)
      vs.forall(out.contains) && out.values.forall(_ != null)
    }
  }

  property("classifier/detector closed vocabularies") =
    forAll { (name: String, sample: List[String]) =>
      Set("TEXT", "NON-TEXT", "UNKNOWN")(
        HeuristicColumnClassifier.classify(name, sample)) &&
        Set("ENGLISH", "NON-ENGLISH", "UNKNOWN")(
          HeuristicLanguageDetector.detect(sample.filter(_ != null)))
    }

  property("TopKOrders bounded, sorted, merge==fold (partial-agg safety)") = {
    val agg = new TopKOrders(3)
    // TopBuf is parallel primitive arrays (array equality is by reference),
    // so compare contents as pairs.
    def pairs(b: TopBuf): List[(Long, Double)] = b.orderkeys.zip(b.prices).toList
    forAll { (rows: List[(Long, Double)]) =>
      val input = rows.zipWithIndex.map { case ((c, p), i) => OrderRow(c, i.toLong, p) }
      val bp = pairs(input.foldLeft(agg.zero)(agg.reduce))
      val sorted = bp.sliding(2).forall {
        case List((ka, pa), (kb, pb)) => pa > pb || (pa == pb && ka < kb)
        case _ => true
      }
      val (l, r) = input.splitAt(input.length / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      Prop(bp.length <= 3) && Prop(sorted) && Prop(pairs(merged) == bp)
    }
  }
}
