"""Engine operators — each a DataFrame-plan builder (SURVEY.md §2)."""
