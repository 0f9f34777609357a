"""Spark-only extensions beyond the reference's surface: large-scale
training-data pipeline operators (deduplication, similarity search,
text analysis, multimodal plumbing). These have no padua equivalent —
they exist because the engine targets 100 TB corpora, not single-machine
matrices."""
