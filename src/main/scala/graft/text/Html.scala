package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-text extraction — the missing FRONT gate of the
  * curation pipeline (c1 starts from clean text; a real crawl
  * pipeline's first operator is markup strip + boilerplate removal).
  * Heuristics are the public jusText / trafilatura lineage (Pomikálek
  * 2011 "Removing boilerplate and duplicate content from web
  * corpora"): segment the page into block-level units, score each
  * block by visible-text length and LINK DENSITY (chars inside
  * `<a>` anchors / visible chars), keep only content-dense blocks.
  * Navigation bars, "read more" teasers and footer link farms are
  * nearly all anchor text and die by density; headline/title
  * fragments die by length.
  *
  * Deliberately parser-less: regex segmentation over the block-closer
  * set, so the whole operator is MAP-ONLY column expressions (no
  * shuffle, no UDF — higher-order `transform`/`filter` over the block
  * array) and an external SQL engine replays it exactly. That is the
  * right 100 TB shape: extraction cost is one pass over the raw
  * bytes, embarrassingly parallel, no state.
  *
  * Output `(doc_id, extracted, n_blocks, n_kept)` composes directly
  * ahead of [[graft.LlmCuration]]: `extract(...)` then rename
  * `extracted` to the curation pipeline's text column.
  */
object Html {

  /** Closing tags that end a block-level unit (the segmentation
    * boundary set). Non-capturing so Spark and RE2 splits agree. */
  private val BlockClose = "</(?:p|div|h[1-6]|li|title|td|th|blockquote)>"

  /** Drop invisible subtrees whole: script/style CONTENT is not text.
    * Two lazy dotall passes (RE2 has no backreferences, so one
    * combined `<(script|style)>.*?</\1>` is not portable). */
  def stripInvisible(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", ""),
      "(?s)<style[^>]*>.*?</style>", "")

  /** Remove every remaining tag, keeping the text between them. */
  def stripTags(x: Column): Column = regexp_replace(x, "<[^>]*>", "")

  /** Minimal entity decode (the named set a generator-controlled
    * corpus needs): `&amp;` LAST, so a literal `&amp;lt;` decodes to
    * `&lt;` once instead of cascading. */
  def decodeEntities(x: Column): Column = {
    val first = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
    replace(first.foldLeft(x) { case (c, (e, v)) => replace(c, lit(e), lit(v)) },
      lit("&amp;"), lit("&"))
  }

  /** Visible text of a block: tags stripped, entities decoded,
    * whitespace runs collapsed, trimmed. */
  def visibleText(b: Column): Column =
    trim(regexp_replace(decodeEntities(stripTags(b)), "\\s+", " "))

  /** Concatenated anchor text of a block (the link-density
    * numerator), normalized the same way as [[visibleText]]. */
  def linkText(b: Column): Column =
    trim(regexp_replace(decodeEntities(array_join(
      regexp_extract_all(b, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)), "")),
      "\\s+", " "))

  /** The page as an array of block units (script/style removed
    * first). The piece after the last block closer rides along as a
    * final block — it is scored like any other and dies by length. */
  def blocks(html: Column): Column = split(stripInvisible(html), BlockClose)

  /** Main-text extraction over a frame: keep blocks with at least
    * `minChars` visible chars AND link density <= 1/3 (integer
    * arithmetic — `3·linkChars <= visChars` — so no float compare),
    * join survivors in document order. */
  /** The surviving content blocks (visible text + link text structs)
    * after the length and link-density gates — the shared core of
    * [[extract]] and [[extractedText]], factored so the frame and
    * column forms cannot drift. */
  private def keptBlocks(html: Column, minChars: Int): Column = {
    require(minChars > 0, s"minChars must be positive, got $minChars")
    val scored = transform(blocks(html), b =>
      struct(visibleText(b).as("v"), linkText(b).as("l")))
    filter(scored, s =>
      length(s.getField("v")) >= minChars &&
        length(s.getField("l")) * 3 <= length(s.getField("v")))
  }

  /** The boilerplate-stripped extraction as ONE map-only COLUMN — the
    * streaming-safe form (a firehose stage wants the text without
    * reshaping the frame; see
    * [[graft.streaming.SelectionPipelineStream.runCrawl]]). */
  def extractedText(html: Column, minChars: Int = 30): Column =
    array_join(transform(keptBlocks(html, minChars),
      s => s.getField("v")), " ")

  def extract(df: DataFrame, id: Column, html: Column,
              minChars: Int = 30): DataFrame = {
    val kept = keptBlocks(html, minChars)
    df.select(id.as("doc_id"),
      array_join(transform(kept, s => s.getField("v")), " ").as("extracted"),
      size(blocks(html)).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept"))
  }
}
