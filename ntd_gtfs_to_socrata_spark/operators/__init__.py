"""Operator library — composable DataFrame transforms (SURVEY.md §2)."""
