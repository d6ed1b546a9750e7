"""Extra input-format readers (query-area definitions, fixtures)."""
