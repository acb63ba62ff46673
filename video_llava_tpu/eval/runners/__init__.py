"""Reference-named runner entry points (thin aliases)."""
