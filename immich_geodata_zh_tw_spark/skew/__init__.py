"""Skew handling: salting + adaptive cell splitting (SURVEY.md §4 X12)."""
