"""Pure DataFrame -> DataFrame relational operators (SURVEY.md §2)."""
