"""DataFrame→DataFrame operators: the engine's operator inventory (SURVEY.md §2)."""
