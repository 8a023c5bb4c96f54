"""Operator library: each module re-expresses one slice of the reference's
operator inventory (SURVEY.md §2) — or an extension-surface capability — as
idiomatic Spark DataFrame programs.
"""
