package graft.pipeline

/** Typed rows of the inference pipeline (SURVEY.md §1.4).
  *
  * The reference moves everything as stringly `Text` KV pairs
  * (`/root/reference/java/PredictDriverCluster.java:34-35`); here the
  * three logical columns stay typed end-to-end and only the sink
  * re-serializes (`%.4f`, tab separator).
  */
final case class Item(path: String, payload: String)

final case class Prediction(path: String, label: String, prob: Double)
