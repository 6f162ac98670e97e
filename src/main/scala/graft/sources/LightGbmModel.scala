package graft.sources

/** Minimal LightGBM **text-format** model scorer — the real-inference side
  * of the PDF layout source's model seam (reference
  * `builder/reader/fast_pdf_parser/parser.py:86-123` loads two trained
  * LightGBM models from HF artifacts; those binaries are absent in this
  * offline sandbox, so the engine accepts an env-pointed model file and
  * runs it when present, mirroring the BPE-vocab seam).
  *
  * Supported subset of the public LightGBM model text format (the format
  * `Booster.save_model()` writes): the header's `num_class` /
  * `num_tree_per_iteration` / `max_feature_idx`, and per-`Tree=` block the
  * `num_leaves`, `split_feature`, `threshold`, `left_child`, `right_child`,
  * `leaf_value` arrays. Numerical splits only (`num_cat=0` models);
  * missing-value/default-left `decision_type` bits are ignored because the
  * engine's feature vectors are never NaN. Categorical-split models are
  * rejected loudly at parse time.
  *
  * Prediction semantics match LightGBM: walk each tree from node 0, go
  * left when `feature <= threshold`, negative child c is leaf `-c - 1`;
  * tree i's leaf value accumulates into class `i % numClass`; multiclass
  * argmax is taken on raw scores (softmax is monotone). For
  * single-output models (`num_tree_per_iteration=1`) the raw sum is
  * returned in class 0 and `predictBinary` applies the sign test
  * (sigmoid(x) > 0.5 iff x > 0).
  */
final class LightGbmModel(val numClass: Int,
                          val maxFeatureIdx: Int,
                          trees: Array[LightGbmModel.Tree]) extends Serializable {

  def numTrees: Int = trees.length

  def rawScores(features: Array[Double]): Array[Double] = {
    val out = new Array[Double](numClass)
    var i = 0
    while (i < trees.length) {
      out(i % numClass) += trees(i).score(features)
      i += 1
    }
    out
  }

  /** Argmax class on raw scores; ties break to the lowest index (same as
    * numpy argmax on LightGBM's predicted probabilities). */
  def predictClass(features: Array[Double]): Int = {
    val s = rawScores(features)
    var best = 0
    var i = 1
    while (i < s.length) { if (s(i) > s(best)) best = i; i += 1 }
    best
  }

  /** Single-output (binary / regression) models: raw score > 0. */
  def predictBinary(features: Array[Double]): Boolean =
    rawScores(features)(0) > 0.0
}

object LightGbmModel {

  private[sources] final class Tree(splitFeature: Array[Int],
                                    threshold: Array[Double],
                                    leftChild: Array[Int],
                                    rightChild: Array[Int],
                                    leafValue: Array[Double]) extends Serializable {
    def score(features: Array[Double]): Double = {
      if (leafValue.length == 1) return leafValue(0) // single-leaf stump
      var node = 0
      while (node >= 0) {
        val f = splitFeature(node)
        val v = if (f < features.length) features(f) else 0.0
        val next = if (v <= threshold(node)) leftChild(node) else rightChild(node)
        if (next < 0) return leafValue(-next - 1)
        node = next
      }
      0.0 // unreachable for well-formed trees
    }
  }

  /** Parse a LightGBM text model. Throws IllegalArgumentException with the
    * offending line/field on anything outside the supported subset. */
  def parse(text: String): LightGbmModel = {
    val header = scala.collection.mutable.HashMap[String, String]()
    val trees = scala.collection.mutable.ArrayBuffer[Tree]()
    var cur: scala.collection.mutable.HashMap[String, String] = null

    def finishTree(): Unit = if (cur != null) {
      def ints(k: String) = cur.getOrElse(k, "").split("\\s+").filter(_.nonEmpty).map(_.toInt)
      def dbls(k: String) = cur.getOrElse(k, "").split("\\s+").filter(_.nonEmpty).map(_.toDouble)
      val numCat = cur.get("num_cat").map(_.trim.toInt).getOrElse(0)
      require(numCat == 0, "categorical splits are not supported by this scorer")
      val leaves = dbls("leaf_value")
      require(leaves.nonEmpty, "tree block missing leaf_value")
      trees += new Tree(ints("split_feature"), dbls("threshold"),
        ints("left_child"), ints("right_child"), leaves)
      cur = null
    }

    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("Tree=")) { finishTree(); cur = scala.collection.mutable.HashMap() }
      else if (line == "end of trees") finishTree()
      else if (line.contains("=")) {
        val i = line.indexOf('=')
        val (k, v) = (line.substring(0, i), line.substring(i + 1))
        if (cur != null) cur(k) = v else header(k) = v
      }
    }
    finishTree()

    val numClass = header.get("num_class").map(_.trim.toInt).getOrElse(1)
    require(trees.nonEmpty, "model has no trees")
    require(numClass >= 1, s"bad num_class=$numClass")
    new LightGbmModel(numClass,
      header.get("max_feature_idx").map(_.trim.toInt).getOrElse(-1),
      trees.toArray)
  }

  def load(path: String): LightGbmModel =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  // per-path cache so executor-side lazy resolution parses each model once
  // per JVM (the file is read off the local filesystem — ship it to a real
  // cluster with spark-submit --files, same as the BPE merges file)
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, LightGbmModel]()

  /** Resolve a model from an env-pointed path; None when the env var is
    * unset. A set-but-unreadable path fails loudly — a deployer pointing
    * at a missing model should not silently fall back to the stub. */
  def fromEnv(envVar: String): Option[LightGbmModel] =
    sys.env.get(envVar).map { p => cache.computeIfAbsent(p, load(_)) }
}
