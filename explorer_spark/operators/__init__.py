"""Composite operators that have no single Spark primitive.

Each module documents the reference semantics it renders and the Spark
plan shape it produces (SURVEY.md §2.6, §2.9 and the additive
LLM-pipeline operators)."""
