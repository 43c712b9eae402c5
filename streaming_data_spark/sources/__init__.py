"""Sources & connectors (SURVEY.md §2.1)."""
