"""SURVEY.md §2.4 declared operator inventory, one module per section."""
