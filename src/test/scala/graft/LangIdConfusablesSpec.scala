package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Measured discrimination accuracy on the CONFUSABLE language pairs —
  * da/no and es/pt share most of their 10-word stopword lists, so the
  * char-n-gram tie-breakers ([[TextAnalysis.charNgrams]]) carry the
  * decision. The fixture is self-authored everyday sentences (common
  * public phrases, natural register — not cherry-picked around the
  * gram tables); the measured per-pair accuracy is recorded in
  * COVERAGE.md and the floor pinned here is 0.8. */
class LangIdConfusablesSpec extends SparkSpec {
  import spark.implicits._

  private val fixture: Seq[(String, String)] = Seq(
    // ---- Danish ----
    "da" -> "Jeg hedder Lars og jeg kommer fra Danmark.",
    "da" -> "Hvad hedder du, og hvor gammel er du?",
    "da" -> "Det er en af de bedste film jeg har set.",
    "da" -> "Vi skal købe mad til hele ugen på torvet.",
    "da" -> "Undskyld, kan du sige det igen, lidt langsommere?",
    "da" -> "Han kan ikke lide at løbe om morgenen.",
    "da" -> "Der er mange mennesker på gaden i dag.",
    "da" -> "Hun læser en bog om dansk historie.",
    "da" -> "Kagen smager godt med kaffe og fløde.",
    "da" -> "Vejret er dårligt, så vi bliver hjemme.",
    "da" -> "Min bror arbejder som lærer på en skole.",
    "da" -> "Om sommeren tager vi til stranden hver uge.",
    // ---- Norwegian (bokmål) ----
    "no" -> "Jeg heter Kari og jeg kommer fra Norge.",
    "no" -> "Hva heter du, og hvor gammel er du?",
    "no" -> "Det er en av de beste filmene jeg har sett.",
    "no" -> "Vi skal kjøpe mat til hele uken på torget.",
    "no" -> "Unnskyld, kan du si det en gang til, litt saktere?",
    "no" -> "Han liker ikke å løpe om morgenen.",
    "no" -> "Det er mange mennesker på gaten i dag.",
    "no" -> "Hun leser en bok om norsk historie.",
    "no" -> "Kaken smaker godt med kaffe og fløte.",
    "no" -> "Været er dårlig, så vi blir hjemme.",
    "no" -> "Broren min jobber som lærer på en skole.",
    "no" -> "Om sommeren drar vi til stranden hver uke.",
    // ---- Spanish ----
    "es" -> "Me llamo Juan y vengo de España.",
    "es" -> "¿Cómo te llamas y cuántos años tienes?",
    "es" -> "Es una de las mejores películas que he visto.",
    "es" -> "Vamos a comprar comida para toda la semana en el mercado.",
    "es" -> "Perdón, ¿puedes decirlo otra vez, un poco más despacio?",
    "es" -> "A él no le gusta correr por la mañana.",
    "es" -> "Hay mucha gente en la calle hoy.",
    "es" -> "Ella lee un libro sobre la historia de España.",
    "es" -> "El pastel sabe bien con café y nata.",
    "es" -> "El tiempo es malo, así que nos quedamos en casa.",
    "es" -> "Mi hermano trabaja como profesor en una escuela.",
    "es" -> "En verano vamos a la playa cada semana.",
    // ---- Portuguese ----
    "pt" -> "Chamo-me João e venho de Portugal.",
    "pt" -> "Como te chamas e quantos anos tens?",
    "pt" -> "É um dos melhores filmes que já vi.",
    "pt" -> "Vamos comprar comida para toda a semana no mercado.",
    "pt" -> "Desculpa, podes dizer outra vez, um pouco mais devagar?",
    "pt" -> "Ele não gosta de correr de manhã.",
    "pt" -> "Há muita gente na rua hoje.",
    "pt" -> "Ela lê um livro sobre a história de Portugal.",
    "pt" -> "O bolo sabe bem com café e natas.",
    "pt" -> "O tempo está mau, por isso ficamos em casa.",
    "pt" -> "O meu irmão trabalha como professor numa escola.",
    "pt" -> "No verão vamos à praia todas as semanas.")

  private lazy val predicted: Seq[(String, String, String)] =
    fixture.toDF("label", "text")
      .select($"label", $"text", TextAnalysis.langId($"text").as("got"))
      .as[(String, String, String)].collect().toSeq

  private def pairAccuracy(a: String, b: String): Double = {
    val rows = predicted.filter(r => r._1 == a || r._1 == b)
    rows.count(r => r._3 == r._1).toDouble / rows.size
  }

  test("da/no discrimination accuracy >= 0.8 on the labeled fixture") {
    val acc = pairAccuracy("da", "no")
    info(f"da/no accuracy: $acc%.3f " +
      predicted.filter(r => (r._1 == "da" || r._1 == "no") && r._3 != r._1)
        .map(r => s"[${r._1}->${r._3}: ${r._2.take(30)}]").mkString(" "))
    assert(acc >= 0.8, f"da/no accuracy $acc%.3f below floor")
  }

  test("es/pt discrimination accuracy >= 0.8 on the labeled fixture") {
    val acc = pairAccuracy("es", "pt")
    info(f"es/pt accuracy: $acc%.3f " +
      predicted.filter(r => (r._1 == "es" || r._1 == "pt") && r._3 != r._1)
        .map(r => s"[${r._1}->${r._3}: ${r._2.take(30)}]").mkString(" "))
    assert(acc >= 0.8, f"es/pt accuracy $acc%.3f below floor")
  }

  test("langId kernel == declarative tree: fixture, planted phrases, fuzz") {
    // the kernel must reproduce the composed-expression decision
    // byte-for-byte: confusable fixture + the 33 planted oracle phrases
    // + adversarial fuzz (mixed scripts straddling the 0.3 ratio, odd
    // whitespace incl. tabs/FF around trim's spaces-only rule, empty
    // and blank strings, supplementary-plane chars counting 2 UTF-16
    // units, stopwords colliding across languages, gram-cap overflow)
    val rnd = new scala.util.Random(7)
    val scripts = Seq('あ', 'ア', '漢', '한', 'ب', 'א', 'द', 'ไ', 'λ')
    val latinWords = Seq("the", "de", "que", "og", "det", "en", "av",
      "af", "y", "e", "a", "ção", "ción", "o", "um", "não", "zzz")
    def fuzz(): String = (0 until rnd.nextInt(30)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => scripts(rnd.nextInt(scripts.size)).toString
        case 1 => latinWords(rnd.nextInt(latinWords.size))
        case 2 => Seq(" ", "\t", "\n", "\f", "  ")(rnd.nextInt(5))
        case 3 => if (rnd.nextBoolean()) "😀" else "x"
      }
    }.mkString(rnd.nextInt(3) match {
      case 0 => "" case 1 => " " case 2 => "\t" })
    val texts = fixture.map(_._2) ++ SparkEntry.langPhrases ++
      Seq("", " ", "\t\t", " aba ") ++ (0 until 300).map(_ => fuzz())
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val diff = df.select($"id", $"text",
        TextAnalysis.langId($"text").as("k"),
        TextAnalysis.langIdDeclarative($"text").as("d"))
      .filter(!($"k" <=> $"d")).collect()
    assert(diff.isEmpty, "kernel/declarative divergence: " +
      diff.take(5).map(r => s"[${r.get(1)}: ${r.get(2)} vs ${r.get(3)}]")
        .mkString(" "))
  }
}
