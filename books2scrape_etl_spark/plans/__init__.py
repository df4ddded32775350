"""Composed query plans: star-schema build, flagship query, summary report."""
