package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** HF-interchange serialization of the engine's merge-rule BPE
  * tokenizer (r17 queue #3): the stored t22 merge table — the billing
  * semantics of the t22/t13c/c11 chain — exported to the PUBLIC
  * `tokenizers`-JSON shape (the `tokenizer.json` a HuggingFace-style
  * trainer loads: a BPE `model` with a `vocab` map and a rank-ordered
  * `merges` list) and re-imported, so the corpus the engine curates
  * and bills is consumable by a real training stack with EXACTLY the
  * token boundaries the engine counted.
  *
  * Export shape (the library's classic serialization; reference:
  * huggingface/tokenizers `tokenizer.json`):
  *
  * {{{
  * { "version": "1.0",
  *   "model": { "type": "BPE",
  *              "vocab": { "<piece>": <id>, ... },
  *              "merges": [ "<left> <right>", ... ] } }
  * }}}
  *
  * - `merges` is the rank order itself — element 0 is the
  *   highest-priority rule, exactly `MergeTable`'s dense array ranks.
  *   The classic form separates left/right with ONE space; corpus
  *   words are whitespace-split upstream so no piece can contain a
  *   space (export enforces this loudly rather than emitting an entry
  *   the importer would mis-split). Import also accepts the newer
  *   two-element-array form (`["left","right"]`) the library emits
  *   since v0.20.
  * - `vocab` is the standard BPE construction: the base alphabet
  *   (every distinct character of the merge sides, sorted for
  *   determinism) gets ids 0..k-1, then each merge's concatenation
  *   takes the next id in rank order (first writer wins when two merge
  *   paths produce the same string — the library's own behavior).
  *   Encode equality depends only on `merges`; the vocab is emitted
  *   because consumers (and the id-mapping a trainer bills by) need it.
  *
  * Scale shape: driver-side by design — a merge table is a frozen
  * artifact of bounded size (2·mergeTier rules today; ~50k for a
  * production tokenizer), not data. Parsing is Jackson (shipped with
  * Spark), no hand-rolled JSON.
  */
object TokenizerInterchange {

  // thread-safe after construction; building one is among the heaviest
  // Jackson operations, so it is a val (r17 review finding)
  private val mapper = new ObjectMapper()

  /** Serialize a rank-ordered merge table to tokenizers-JSON. */
  def exportJson(merges: Array[(String, String)]): String = {
    merges.foreach { case (l, r) =>
      require(!l.contains(" ") && !r.contains(" ") && l.nonEmpty && r.nonEmpty,
        s"merge rule ('$l','$r') cannot ride the space-separated " +
          "interchange form (empty or space-carrying piece)")
    }
    val m = mapper
    val root = m.createObjectNode()
    root.put("version", "1.0")
    val model = root.putObject("model")
    model.put("type", "BPE")
    val vocab = model.putObject("vocab")
    var id = 0
    def add(tok: String): Unit =
      if (!vocab.has(tok)) { vocab.put(tok, id); id += 1 }
    // base alphabet first (sorted — deterministic ids), then merged
    // pieces in rank order: the standard BPE vocab construction.
    // CODEPOINTS, not chars: toCharArray would split a supplementary
    // (non-BMP) character into two lone surrogates — invalid Unicode
    // vocab keys the tokenizers loader rejects (r17 review finding)
    merges.flatMap { case (l, r) =>
      (l + r).codePoints().toArray.map(Character.toString)
    }.distinct.sorted.foreach(add)
    merges.foreach { case (l, r) => add(l + r) }
    val arr = model.putArray("merges")
    merges.foreach { case (l, r) => arr.add(s"$l $r") }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Parse a tokenizers-JSON BPE model back to the rank-ordered merge
    * table. Accepts both merge serializations (classic "l r" strings
    * and v0.20+ ["l","r"] pairs); everything outside model.merges —
    * normalizers, pre-tokenizers, added tokens — is irrelevant to the
    * merge-order encode and ignored. */
  def importJson(json: String): Array[(String, String)] = {
    val root = mapper.readTree(json)
    val model = root.path("model")
    require(model.path("type").asText() == "BPE",
      s"not a BPE tokenizer model: type=${model.path("type").asText()}")
    val merges = model.path("merges")
    require(merges.isArray, "model.merges missing or not an array")
    val out = Array.newBuilder[(String, String)]
    merges.forEach { n =>
      if (n.isArray) {
        val a = n.asInstanceOf[ArrayNode]
        require(a.size == 2, s"pair-form merge entry with ${a.size} elements")
        out += ((a.get(0).asText(), a.get(1).asText()))
      } else {
        val parts = n.asText().split(" ", 2)
        require(parts.length == 2, s"unsplittable merge entry '${n.asText()}'")
        out += ((parts(0), parts(1)))
      }
    }
    out.result()
  }

  /** Export the stored t22 merge table of `dir`'s corpus snapshot to
    * `path` (the file a trainer's tokenizer loads). */
  def writeTokenizerJson(s: org.apache.spark.sql.SparkSession, dir: String,
                         path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      exportJson(graft.operators.SubwordQueries.storedMerges(s, dir)))

  def readTokenizerJson(path: String): Array[(String, String)] =
    importJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
