"""Training-data pipeline extensions: dedup, similarity search,
text analysis, multimodal plumbing."""
