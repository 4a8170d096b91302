"""Dataflow operators of the ingest pipeline (SURVEY.md §2) plus the
large-scale training-data extensions (dedup / similarity / text / multimodal).
"""
