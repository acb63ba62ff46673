"""Session/prompt runtime: conversations, tokenization, inference API,
interactive chat."""
