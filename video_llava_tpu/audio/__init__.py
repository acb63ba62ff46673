"""Audio transcription pipeline (ASR + audio tagging)."""
