"""Operator library (SURVEY.md §2): filters, joins, aggregates,
windows, set ops, scalar functions."""
