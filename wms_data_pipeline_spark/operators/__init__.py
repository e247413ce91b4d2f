"""Operator library — each module maps a cluster of SURVEY.md §2 operators."""
