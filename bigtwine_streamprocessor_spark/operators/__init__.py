"""Operator library: every row transform / filter / aggregation of SURVEY.md §2
as composable DataFrame functions, plus the large-scale training-data operators
(dedup, similarity, text analysis, multimodal plumbing)."""
