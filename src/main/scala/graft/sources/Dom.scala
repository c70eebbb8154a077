package graft.sources

/** Minimal HTML DOM: a parse tree with the handful of selector
  * operations the polla.cl extraction needs (class selection, first
  * descendant by tag, ancestor walk, stripped strings). The sandbox has
  * no jsoup, and the full CSS machinery isn't needed — the reference's
  * extraction (`sources/pozos.py:363-438`) uses exactly: find-string,
  * `find_parent("li")`, `find(class_=…)`, `select(".cls")`,
  * `select_one("img")`, `stripped_strings`, `get_text(strip=True)`.
  *
  * The parser is tolerant the way browsers are: unknown/unclosed tags
  * don't abort, void elements never nest, `li`/`p`/`tr`/`td`/`option`
  * auto-close a same-tag sibling, script/style bodies are raw text.
  */
object Dom {

  sealed trait Node { def parentElem: Option[Elem] }

  final class TextNode(val value: String, p: Elem) extends Node {
    def parentElem: Option[Elem] = Option(p)
  }

  final class Elem(val tag: String, val attrs: Map[String, String], p: Elem)
      extends Node {
    private[Dom] val childBuf = scala.collection.mutable.ArrayBuffer[Node]()
    def parentElem: Option[Elem] = Option(p)
    def children: Seq[Node] = childBuf.toSeq

    def attr(name: String): Option[String] = attrs.get(name)
    def classes: Set[String] =
      attrs.getOrElse("class", "").split("\\s+").filter(_.nonEmpty).toSet

    /** Pre-order descendants, excluding self. */
    def descendants: Iterator[Node] = childBuf.iterator.flatMap {
      case e: Elem => Iterator.single(e: Node) ++ e.descendants
      case t => Iterator.single(t)
    }
    def descendantElems: Iterator[Elem] =
      descendants.collect { case e: Elem => e }

    /** All descendant elements carrying the CSS class (`.cls`). */
    def byClass(c: String): Seq[Elem] =
      descendantElems.filter(_.classes.contains(c)).toSeq
    /** First descendant element with the tag (`select_one`). */
    def firstByTag(t: String): Option[Elem] =
      descendantElems.find(_.tag == t)
    /** Nearest STRICT ancestor with the tag (`find_parent`). */
    def ancestor(t: String): Option[Elem] = {
      var cur = parentElem
      while (cur.isDefined && cur.get.tag != t) cur = cur.get.parentElem
      cur
    }

    /** Non-empty trimmed text descendants, document order
      * (`stripped_strings`). */
    def strippedStrings: Seq[String] =
      descendants.collect { case t: TextNode => t.value.trim }
        .filter(_.nonEmpty).toSeq
    /** `get_text(strip=True)`: stripped strings joined with nothing. */
    def textStripped: String = strippedStrings.mkString("")

    /** First text descendant whose value contains `sub` → its owning
      * element (`soup.find(string=…) … .parent`). */
    def findStringOwner(sub: String): Option[Elem] =
      (childBuf.iterator.flatMap {
        case t: TextNode => if (t.value.contains(sub)) Iterator.single(this) else Iterator.empty
        case e: Elem => e.findStringOwner(sub).iterator
      }).nextOption()
  }

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style")
  /** Opening one of these while the same tag is open implicitly closes
    * the sibling (the common hand-written-HTML omission). */
  private val AutoClose = Set("li", "p", "tr", "td", "th", "option")

  private val AttrRe =
    """([a-zA-Z_:][-a-zA-Z0-9_:.]*)(?:\s*=\s*("([^"]*)"|'([^']*)'|[^\s>]+))?""".r

  private def parseAttrs(s: String): Map[String, String] =
    AttrRe.findAllMatchIn(s).map { m =>
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .orElse(Option(m.group(2))).getOrElse("")
      m.group(1).toLowerCase -> Html.unescape(v)
    }.toMap

  /** Parse to a synthetic root element (tag "#root"). */
  def parse(html: String): Elem = {
    // one lowercase copy for raw-text close-tag scans — real SPA pages
    // carry dozens of <script> blocks in MBs of markup, and lowercasing
    // the whole document per script tag would be quadratic allocation
    val htmlLower = html.toLowerCase
    val root = new Elem("#root", Map.empty, null)
    var stack = List(root)
    def top = stack.head
    def addText(s: String): Unit =
      if (s.nonEmpty) top.childBuf += new TextNode(Html.unescape(s), top)

    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { addText(html.substring(i)); i = n }
      else {
        addText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          val name = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          // pop to the matching open tag if present; ignore stray closers
          if (stack.exists(_.tag == name))
            stack = stack.dropWhile(_.tag != name).drop(1) match {
              case Nil => List(root)
              case s => s
            }
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(lt + 1, end).trim
            val selfClosed = inner.endsWith("/")
            val body = if (selfClosed) inner.dropRight(1) else inner
            val sp = body.indexWhere(Character.isWhitespace)
            val tag = (if (sp < 0) body else body.substring(0, sp)).toLowerCase
            val attrs = if (sp < 0) Map.empty[String, String]
              else parseAttrs(body.substring(sp))
            if (tag.nonEmpty && tag.head.isLetter) {
              if (AutoClose.contains(tag) && top.tag == tag)
                stack = stack.tail match { case Nil => List(root); case s => s }
              val e = new Elem(tag, attrs, top)
              top.childBuf += e
              if (RawTextTags.contains(tag)) {
                // raw text: consume verbatim until the matching closer
                val closer = s"</$tag"
                val idx = htmlLower.indexOf(closer, end + 1)
                val stop = if (idx < 0) n else idx
                if (stop > end + 1)
                  e.childBuf += new TextNode(html.substring(end + 1, stop), e)
                val gt = html.indexOf('>', stop)
                i = if (idx < 0 || gt < 0) n else gt + 1
              } else {
                if (!selfClosed && !VoidTags.contains(tag)) stack = e :: stack
                i = end + 1
              }
            } else i = end + 1 // malformed tag: skip it
          }
        }
      }
    }
    root
  }
}
