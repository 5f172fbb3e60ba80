"""Source/scan stage: document content → flat triple rows (SURVEY §2.1)."""
