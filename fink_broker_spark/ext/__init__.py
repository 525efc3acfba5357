"""Extensions beyond the reference's operator surface (SURVEY.md §7.1.8):
deduplication families, similarity search, multimodal columns."""
