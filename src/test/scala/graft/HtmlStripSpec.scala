package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** HTML → text extraction: block removal, entity decode ordering, and
  * portability edges of the column-expression chain. */
class HtmlStripSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(TextAnalysis.stripHtml($"h")).collect().head.getString(0)

  test("script/style/comment blocks vanish wholesale, including their text") {
    assert(strip("a<script>if (x<1) alert('<b>')</script>b") == "a b")
    assert(strip("a<style type=\"css\">p > span { }</style>b") == "a b")
    assert(strip("a<!-- hidden <b>bold</b> -->b") == "a b")
    // multiline + mixed case
    assert(strip("a<SCRIPT>\nline1\nline2\n</SCRIPT>b") == "a b")
  }

  test("tags with attributes strip; text and unknown entities survive") {
    assert(strip("<p class=\"x\" id='y'>hello <b>world</b></p>") == "hello world")
    assert(strip("T&iacute;tle") == "T&iacute;tle")
  }

  test("entity decode: &amp; decodes last, so double-encoding stays encoded") {
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;a&#39; x&nbsp;y &amp; z")
      == "<tag> \"q\" 'a' x y & z")
    // the classic trap: &amp;lt; is the TEXT "&lt;", not a tag opener
    assert(strip("&amp;lt;notatag&amp;gt;") == "&lt;notatag&gt;")
  }

  test("whitespace collapses; null maps to null") {
    assert(strip("a\n\n   b\t\tc\r\n") == "a b c")
    val r = Seq[Option[String]](None).toDF("h")
      .select(TextAnalysis.stripHtml($"h")).collect().head
    assert(r.isNullAt(0))
  }

  test("stripped text never retains a complete tag") {
    val htmls = Seq(
      "<div><p>x</p></div>", "<a href=\"u?a=1&b=2\">link</a>",
      "plain", "<br/><hr>", "<em>e</em>m")
    htmls.foreach { h =>
      val out = strip(h)
      assert(!out.matches(".*<[^>]*>.*"), s"tag survived in: $out")
    }
  }
}
