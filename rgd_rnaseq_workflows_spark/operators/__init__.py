"""Relational and scale operators (SURVEY §2 inventory + LLM-data extensions)."""
