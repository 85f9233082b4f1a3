"""Relational / ETL / data-pipeline operators (SURVEY.md §2)."""
