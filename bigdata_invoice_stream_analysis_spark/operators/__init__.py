"""Relational operators (SURVEY.md §2)."""
