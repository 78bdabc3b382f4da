"""Operator library: SSC estimators/transformers re-expressed from the
reference (SURVEY.md §2.1) plus the LLM-data-pipeline extension
operators (§2.3)."""
