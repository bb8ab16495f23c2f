"""Corpus tooling: HDVILA metadata conversion, offline media extraction,
captioner deployment configs (reference data/ scripts, SURVEY §2.2 #41)."""
