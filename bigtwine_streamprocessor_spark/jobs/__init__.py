"""Job entry points mirroring the reference's three mains (SURVEY.md §3)."""
